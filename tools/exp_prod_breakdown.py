#!/usr/bin/env python3
"""Experiment: stage-by-stage timing of the PRODUCTION add-step forms.

Times each component of search/add.make_step in isolation, in the exact
form the step executes it (fel limb rows on (X, 8, 128) tiles, unrolled
native forms on TPU), so the per-step wall time can be attributed:

  inv_mod_batch | chord affine_add pair | endo beta muls |
  serialize+SHA | RMD | pow2 probe (1/2/4 probes) | full hash160 | step

Chained timing throughout: each iteration data-depends on the previous,
one final host fetch forces the chain (block_until_ready is unreliable
through the device tunnel, see tools/exp_vpu_slope.py).

Usage: python tools/exp_prod_breakdown.py  [B=131072] [IT=30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, x, iters, label, elems):
    """Every benched f maps a 16-row tuple -> 16-row tuple so calls can
    chain (each iteration data-depends on the last); one final fetch
    forces the chain."""
    import numpy as np
    t0 = time.time()
    out = f(x)
    np.asarray(out[0])
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        x = f(x)
    np.asarray(x[0])
    dt = time.time() - t0
    per = dt / iters
    print(f"{label:44s}: {per * 1e3:8.3f} ms/iter  "
          f"{elems / per / 1e6:9.1f} Melem/s  (compile {tc:.1f}s)",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("EXP_CPU") == "1":
        # the axon plugin ignores JAX_PLATFORMS; config wins
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE",
                                         "/tmp/ecloop_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ecloop_tpu import fel, ecc, filters, hash160

    B = int(os.environ.get("B", 131072))
    IT = int(os.environ.get("IT", 30))
    shape = (B // 1024, 8, 128)
    rng = np.random.default_rng(7)

    def rand_rows():
        return tuple(jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
            for _ in range(16))

    a = rand_rows()
    b = rand_rows()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
          f"B={B} tiles={shape}", flush=True)

    # -- dispatch-overhead floor: trivial kernel, chained ------------------
    def triv(x):
        return tuple(r + np.uint32(1) for r in x)
    timed(jax.jit(triv), a, IT, f"dispatch floor (x+1, B={B})", B)

    # -- field mul / sqr (x8 chained) ------------------------------------
    def mm8(x):
        for _ in range(8):
            x = fel.mul_mod(x, b)
        return x
    timed(jax.jit(mm8), a, IT, f"fel.mul_mod x8 (B={B})", 8 * B)

    def sq8(x):
        for _ in range(8):
            x = fel.sqr_mod(x)
        return x
    timed(jax.jit(sq8), a, IT, f"fel.sqr_mod x8 (B={B})", 8 * B)

    # -- batch inversion at production padding ---------------------------
    flat = tuple(r.reshape(-1) for r in a)
    for lanes in (1024, 4096):
        def invf(x, lanes=lanes):
            return fel.mul_mod(fel.inv_mod_batch(x, lanes=lanes), flat)
        timed(jax.jit(invf), flat, max(2, IT // 3),
              f"inv_mod_batch (B={B}, lanes={lanes})", B)

    # -- chord pair (2x affine_add_rows, shared inverse) ------------------
    def chordpair(x):
        xp, yp = ecc.affine_add_rows(x, a, b, a, b)
        xm, ym = ecc.affine_add_rows(x, a, b, fel.neg_mod(a), b)
        return fel.add_mod(xp, xm), None
    timed(jax.jit(lambda x: chordpair(x)[0]), a, IT,
          f"chord pair (2x affine_add_rows, B={B})", 2 * B)

    # -- endo synthesis: 2 beta muls + neg -------------------------------
    from ecloop_tpu import golden
    b1 = fel.const_rows(golden.BETA1)
    b2 = fel.const_rows(golden.BETA2)

    def endo(x):
        x1 = fel.mul_mod(x, b1)
        x2 = fel.mul_mod(x, b2)
        return fel.add_mod(x1, x2), None
    timed(jax.jit(lambda x: endo(x)[0]), a, IT, f"endo 2 beta muls (B={B})",
          2 * B)

    # -- hash pipeline, split --------------------------------------------
    def sha16(x):
        st = hash160.sha256_compress_list(hash160.msg33_rows(x, b))
        out = list(st) + [st[0] ^ r for r in x[8:]]
        return tuple(out[:16]), None
    timed(jax.jit(lambda x: sha16(x)[0]), a, IT,
          f"serialize+SHA-256 (B={B})", B)

    def rmd16(x):
        h = hash160.hash160_rows_from_sha(list(x[:8]))
        out = list(h) + [h[0] ^ r for r in x[5:]]
        return tuple(out[:16]), None
    timed(jax.jit(lambda x: rmd16(x)[0]), a, IT, f"RMD-160 (B={B})", B)

    def h33(x):
        h = hash160.addr33_hash_rows(x, b)
        out = list(h) + [h[0] ^ r for r in x[5:]]
        return tuple(out[:16]), None
    timed(jax.jit(lambda x: h33(x)[0]), a, IT, f"addr33_hash_rows (B={B})", B)

    # -- probe ------------------------------------------------------------
    filt = filters.load_filter(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "btc-puzzles-hash"))
    print(f"filter: pow2 log2_bits={filt.pow2_log2} "
          f"probes={filt.pow2_probes}", flush=True)
    from ecloop_tpu import bloom

    for np_ in (1, 2, 4):
        def probe(x, np_=np_):
            hit = bloom.probe_pow2(list(x[:5]), jnp.asarray(filt.device_bits),
                                   log2_bits=filt.pow2_log2, nprobes=np_)
            out = [r ^ hit.astype(jnp.uint32) for r in x]
            return tuple(out), None
        timed(jax.jit(lambda x, np_=np_: probe(x, np_)[0]), a, IT,
              f"probe_pow2 nprobes={np_} (B={B})", B)

    # -- full production step reference ----------------------------------
    from ecloop_tpu.search import SearchConfig, AddSearch
    group_k = min(4096, max(64, B // 4))
    cfg = SearchConfig(range_s=0x100000000, range_e=0x200000000,
                       addr33=True, addr65=False, endo=True,
                       centers=max(1, B // group_k), group_k=group_k,
                       lanes=min(4096, B), steps_per_call=1)
    eng = AddSearch(cfg, filt, init="host")
    cx, cy = eng._init_centers(cfg.range_s)
    t0 = time.time()
    cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx, eng.dpy,
                                eng.bits)
    np.asarray(masks)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(IT):
        cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                    eng.dpy, eng.bits)
    np.asarray(masks)
    np.asarray(cx)
    dt = (time.time() - t0) / IT
    print(f"{'FULL step (endo, addr33)':44s}: {dt * 1e3:8.3f} ms/iter  "
          f"{B * 6 / dt / 1e6:9.1f} Mkeys/s  (compile {tc:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
