"""Microbenchmark & verification harness (counterpart of reference
lib/bench.c: run_bench 17-112, run_bench_gtable 114-141, mult_verify
143-166).

TPU measurement model: every op is batched over B elements and iterated
R times inside one jitted lax.fori_loop, so dispatch overhead amortizes
and the number reported is sustained device throughput (elements/sec),
comparable against the reference's per-core it/s.
"""

from __future__ import annotations

import os
import time

import numpy as np


def _force(out):
    """Force execution with a real host fetch of one result array.
    jax.block_until_ready returns without waiting through the axon
    device tunnel (measured in tools/exp_vpu_slope.py), so timing loops
    that rely on it read dispatch time, not execution time."""
    x = out
    while isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(x)


def _rate(fn, *args, iters: int = 3):
    """Wall-time fn(*args) -> calls/sec (forced by host fetch)."""
    _force(fn(*args))          # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return iters / (time.perf_counter() - t0)


def _rand_fes(rng: np.random.Generator, n: int):
    """Random field elements < P as (n, 16) uint32 limbs."""
    from . import fe
    vals = [int.from_bytes(rng.bytes(32), "little") % fe.P for _ in range(n)]
    return np.asarray(fe.ints_to_limbs(vals))


def run_bench() -> int:
    """Per-kernel throughput microbenchmarks with DCE-defeating asserts."""
    import jax
    import jax.numpy as jnp
    from . import ecc, fe, golden, hash160

    B = int(os.environ.get("ECLOOP_BENCH_B", 8192))
    R = int(os.environ.get("ECLOOP_BENCH_R", 16))
    rng = np.random.default_rng(42)

    xs = jnp.asarray(_rand_fes(rng, B))
    ys = jnp.asarray(_rand_fes(rng, B))
    ks = jnp.asarray(_rand_fes(rng, B))
    # valid curve points for point-op benches
    pts = [golden.point_mul(k) for k in range(2, 2 + 64)]
    px = jnp.asarray(fe.ints_to_limbs([p[0] for p in pts] * (B // 64)))
    py = jnp.asarray(fe.ints_to_limbs([p[1] for p in pts] * (B // 64)))
    qx = jnp.roll(px, 1, axis=0)
    qy = jnp.roll(py, 1, axis=0)
    one = jnp.broadcast_to(jnp.asarray(fe.ONE), px.shape)

    def loop(body):
        def fn(*args):
            def it(_, a):
                return body(*a)
            return jax.lax.fori_loop(0, R, it, args)
        return jax.jit(fn)

    plat = jax.devices()[0].platform
    print(f"# device: {plat} x{len(jax.devices())} ~ B={B} R={R}",
          flush=True)
    from . import sol
    try:
        vpu, _ = sol.peaks()
    except Exception:  # pragma: no cover — never block the bench
        vpu = None

    def emit(name, mits, ops):
        """One row, printed the moment it is measured (a buffered
        summary leaves a timed-out run with an EMPTY log — the
        bench_micro rc=124 failure mode).  Speed-of-light column when a
        traced op budget exists (SURVEY §5; VERDICT r1 #5)."""
        if vpu and ops:
            pct = mits * 1e6 * ops / vpu
            print(f"{name:42s}: {mits:10.3f} M it/s  "
                  f"[{ops:6.0f} ops/elem ~ {pct:5.1%} of VPU peak]",
                  flush=True)
        else:
            print(f"{name:42s}: {mits:10.3f} M it/s", flush=True)

    def bench(name, fn, args, per_call, trace=None):
        """trace=(fn1, args1): single-iteration form of the SAME kernel
        being measured — traced for its ops/elem budget so the
        %-of-peak column's numerator and denominator describe one
        implementation (ADVICE r2: dividing the padded/scan fe kernels
        by the unrolled fel budgets skewed the utilization)."""
        t0 = time.perf_counter()
        r = _rate(fn, *args)
        ops = None
        if trace is not None:
            try:
                ops = sol.ops_per_element(trace[0], *trace[1],
                                          elems=per_call)
            except Exception:  # pragma: no cover — never block the bench
                ops = None
        emit(name, r * R * per_call / 1e6, ops)
        if os.environ.get("ECLOOP_BENCH_VERBOSE"):
            print(f"  [{name}: total {time.perf_counter() - t0:.1f}s]",
                  flush=True)

    bench("fe_modp_mul", loop(lambda a, b: (fe.mul_mod_p(a, b), b)),
          (xs, ys), B, trace=(fe.mul_mod_p, (xs, ys)))
    bench("fe_modp_sqr", loop(lambda a: (fe.sqr_mod_p(a),)), (xs,), B,
          trace=(fe.sqr_mod_p, (xs,)))
    bench("fe_modp_inv (fermat chain)",
          loop(lambda a: (fe.inv_mod_p(a),)), (xs,), B)
    bench("fe_modp_grpinv (batched)",
          loop(lambda a: (fe.inv_mod_p_batch(a, lanes=1024),)), (xs,), B)

    bench("ec_affine_add (chord, amortized inv)",
          loop(lambda ax, ay, bx, by:
               ecc.batch_affine_add(ax, ay, bx, by, lanes=1024) + (bx, by)),
          (px, py, qx, qy), B,
          trace=(lambda ax, ay, bx, by:
                 ecc.batch_affine_add(ax, ay, bx, by, lanes=1024),
                 (px, py, qx, qy)))
    bench("ec_proj_add",
          loop(lambda ax, ay, az, bx, by:
               ecc.proj_add(ax, ay, az, bx, by, az) + (bx, by)),
          (px, py, one, qx, qy), B)
    bench("ec_proj_dbl",
          loop(lambda ax, ay, az: ecc.proj_dbl(ax, ay, az)),
          (px, py, one), B)
    # v2 jacobian rows, mirroring the reference's add2/dbl2 comparison
    # (lib/bench.c:33-36; production dispatches the projective v1 ops,
    # same choice as reference ecc.c:812-815)
    bench("ec_jac_add (v2)",
          loop(lambda ax, ay, az, bx, by:
               ecc.jac_add(ax, ay, az, bx, by, az) + (bx, by)),
          (px, py, one, qx, qy), B)
    bench("ec_jac_dbl (v2)",
          loop(lambda ax, ay, az: ecc.jac_dbl(ax, ay, az)),
          (px, py, one), B)

    Bm = min(B, 1024)
    # heavy enough per call that dispatch amortizes without the fori wrapper
    r = _rate(jax.jit(ecc.scalar_mul), ks[:Bm])
    emit("ec_scalar_mul (double-and-add)", r * Bm / 1e6, None)

    from .search.mul import build_gtable, window_indices
    w = int(os.environ.get("ECLOOP_GTABLE_W", 14))
    tx, ty = build_gtable(w)
    keys = [int.from_bytes(rng.bytes(32), "little") % golden.N
            for k in range(Bm)]
    idx = jnp.asarray(window_indices(keys, w).T)

    def gmul(idx_, tx_, ty_):
        def body(carry, idx_i):
            qx_, qy_, qz_ = carry
            gx = jnp.take(tx_, jnp.maximum(idx_i, 0), axis=0)
            gy = jnp.take(ty_, jnp.maximum(idx_i, 0), axis=0)
            nx, ny, nz = ecc.proj_add_affine(qx_, qy_, qz_, gx, gy)
            skip = idx_i < 0
            return (fe.select(skip, qx_, nx), fe.select(skip, qy_, ny),
                    fe.select(skip, qz_, nz)), None
        zeros = jnp.zeros((idx_.shape[1], 16), dtype=jnp.uint32)
        (ax, ay, az), _ = jax.lax.scan(body, ecc.proj_infinity(zeros), idx_)
        return ax, ay, az

    r = _rate(jax.jit(gmul), idx, tx, ty)
    emit("ec_gtable_mul (w=%d)" % w, r * Bm / 1e6, None)

    bench("addr33 (hash160 compressed)",
          loop(lambda x, y: (hash160.addr33_hash(x, y), y)), (px, py), B,
          trace=(hash160.addr33_hash, (px, py)))
    bench("addr65 (hash160 uncompressed)",
          loop(lambda x, y: (hash160.addr65_hash(x, y), y)), (px, py), B,
          trace=(hash160.addr65_hash, (px, py)))

    if vpu and os.environ.get("ECLOOP_BENCH_SOL", "1") == "1":
        from .search.common import SearchConfig
        print()
        print(sol.report(SearchConfig(endo=True)))
    return 0


def run_bench_gtable() -> int:
    """Window-width sweep (reference bench.c:114-141): table build time,
    mul throughput, table memory."""
    import jax
    import jax.numpy as jnp
    from . import ecc, fe, golden
    from .search.mul import build_gtable, window_indices

    # full reference sweep 8..22 (bench.c:114-141) on TPU; the top
    # widths are the HBM-interesting ones (a w=22 table is 6.4 GB —
    # trading gather footprint against window count).  CPU default stays
    # small: the eager build at w >= 16 takes hours on one core.
    default_ws = ("8 10 12 14 16 18 20 22"
                  if jax.default_backend() != "cpu" else "8 10 12 14")
    ws = [int(w) for w in os.environ.get(
        "ECLOOP_GTABLE_WS", default_ws).split()]
    B = int(os.environ.get("ECLOOP_BENCH_B", 1024))
    rng = np.random.default_rng(7)
    keys = [int.from_bytes(rng.bytes(32), "little") % golden.N
            for _ in range(B)]

    # per-w speed-of-light ceiling: min(VPU op budget, HBM gather
    # budget) — justifies the production w choice against a model
    # (SURVEY §7 'HBM gather bandwidth will bound mul'; VERDICT r2 #7)
    from . import sol
    from .search.common import SearchConfig
    try:
        leaf = sol.leaf_budgets()
        sol_cfg = SearchConfig(addr33=True, addr65=False)
    except Exception:  # pragma: no cover — never block the sweep
        leaf = None

    print(f"{'W':>3} | {'G_SIZE':>10} | {'MEM':>9} | {'BUILD_T':>8} |"
          f" {'MUL_RATE':>12} | {'CEILING':>10} | {'BOUND':>5}")
    for w in ws:
        n = 1 << w
        d = (255 // w) + 1
        npoints = d * (n - 1)
        mem_mb = npoints * 2 * 16 * 4 / 2**20
        t0 = time.perf_counter()
        build_gtable.cache_clear()
        try:
            tx, ty = build_gtable(w, how="device")
            _force(tx[:1])
        except Exception as e:  # noqa: BLE001 — keep sweeping (e.g. OOM)
            print(f"{w:>3} | {npoints:>10,} | {mem_mb:>6.1f}MB | "
                  f"build failed: {type(e).__name__}")
            continue
        build_t = time.perf_counter() - t0

        idx = jnp.asarray(window_indices(keys, w).T)

        # measure the PRODUCTION window-scan form (tiled fel rows,
        # incomplete adds below the top window — exactly what
        # search/mul.make_mul_step executes), not a flat fe-layout
        # stand-in: (B, 16) arrays fill 16 of 128 lanes and under-read
        # the rate ~8x, which made the ceiling column meaningless
        from . import fel
        tiled = B % 1024 == 0
        bshape = (B // 1024, 8, 128) if tiled else (B,)

        def t3(rows):
            return tuple(r.reshape(bshape) for r in rows)

        def gmul(idx_, tx_=tx, ty_=ty):
            def mk_body(complete):
                def body(carry, idx_i):
                    qx_, qy_, qz_ = carry
                    gx = t3(fel.from_last(
                        jnp.take(tx_, jnp.maximum(idx_i, 0), axis=0)))
                    gy = t3(fel.from_last(
                        jnp.take(ty_, jnp.maximum(idx_i, 0), axis=0)))
                    nx, ny, nz = ecc.proj_add_affine_rows(
                        qx_, qy_, qz_, gx, gy, complete=complete)
                    skip = (idx_i < 0).reshape(bshape)
                    return (fel.select(skip, qx_, nx),
                            fel.select(skip, qy_, ny),
                            fel.select(skip, qz_, nz)), None
                return body
            zero = fel.const_rows(0, bshape)
            one = fel.const_rows(1, bshape)
            carry, _ = jax.lax.scan(mk_body(False), (zero, one, zero),
                                    idx_[:-1])
            (qx_, qy_, qz_), _ = mk_body(True)(carry, idx_[-1])
            return qx_[0], qy_[0], qz_[0]

        rate = _rate(jax.jit(gmul), idx) * B / 1e6
        ceil_txt, bound = "n/a", ""
        if leaf:
            # scan-only ceiling: this sweep times the window scan alone
            c = sol.mul_ceiling(sol_cfg, w, leaf, scan_only=True)
            ceil_txt = f"{c['ceiling_keys_per_s'] / 1e6:7.2f} M/s"
            bound = c["binding"]
        print(f"{w:>3} | {npoints:>10,} | {mem_mb:>6.1f}MB | "
              f"{build_t:>6.2f}s | {rate:>9.3f} M/s | {ceil_txt:>10} | "
              f"{bound:>5}")
    build_gtable.cache_clear()
    return 0


def mult_verify(count: int | None = None) -> int:
    """Cross-check the two scalar-mul paths on random scalars + curve
    membership (reference mult_verify, bench.c:143-166). Exits 1 on any
    mismatch."""
    import jax
    import jax.numpy as jnp
    from . import ecc, fe, golden
    from .search.mul import build_gtable, window_indices

    count = count or int(os.environ.get("ECLOOP_VERIFY_N", 16000))
    B = min(count, 2048)
    rng = np.random.default_rng(1337)
    w = 14
    tx, ty = build_gtable(w)

    daa = jax.jit(lambda k: ecc.scalar_mul(k))
    rdc = jax.jit(lambda x, y, z: ecc.proj_to_affine(x, y, z, lanes=1024))

    def gmul(idx_, tx_, ty_):
        def body(carry, idx_i):
            qx_, qy_, qz_ = carry
            gx = jnp.take(tx_, jnp.maximum(idx_i, 0), axis=0)
            gy = jnp.take(ty_, jnp.maximum(idx_i, 0), axis=0)
            nx, ny, nz = ecc.proj_add_affine(qx_, qy_, qz_, gx, gy)
            skip = idx_i < 0
            return (fe.select(skip, qx_, nx), fe.select(skip, qy_, ny),
                    fe.select(skip, qz_, nz)), None
        zeros = jnp.zeros((idx_.shape[1], 16), dtype=jnp.uint32)
        (ax, ay, az), _ = jax.lax.scan(body, ecc.proj_infinity(zeros), idx_)
        return ax, ay, az

    gmul_j = jax.jit(gmul)
    oncurve = jax.jit(ecc.on_curve)

    done = 0
    t0 = time.perf_counter()
    while done < count:
        n = min(B, count - done)
        keys = [1 + int.from_bytes(rng.bytes(32), "little") % (golden.N - 1)
                for _ in range(n)]
        kl = jnp.asarray(fe.ints_to_limbs(keys))
        a = rdc(*daa(kl))
        idx = jnp.asarray(window_indices(keys, w).T)
        b = rdc(*gmul_j(idx, tx, ty))
        if not bool(jnp.all(oncurve(*a)) & jnp.all(oncurve(*b))):
            print("FAILED: point off curve")
            return 1
        if not bool(jnp.all((a[0] == b[0]) & (a[1] == b[1]))):
            print("FAILED: gtable vs double-and-add mismatch")
            return 1
        done += n
        dt = time.perf_counter() - t0
        print(f"\r{done:,} / {count:,} ~ {done / dt / 1000:.1f} K/s",
              end="", flush=True)
    print("\nOK: all multiplications verified")
    return 0
