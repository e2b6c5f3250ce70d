#!/usr/bin/env python3
"""Ablate the mul window-scan's per-window device cost (r5).

Times, at a given batch, 18-iteration scans whose body is:
  gather   - only the two jnp.take gathers from the (311k, 16) table
  gatherT  - the same gathers from a (16, 311k) limb-plane layout
  padd     - only the Pallas mixed add (constant table point, no gather)
  xadd     - only the XLA-form mixed add (for comparison)
  full     - gather + Pallas add (the production body)
plus the non-scan tail (inversion + 2 muls + hash33 + probe) once.

Run on the TPU: python tools/exp_mul_profile.py [batch ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import ecloop_tpu
    ecloop_tpu.enable_compile_cache()
    import numpy as np
    import jax.numpy as jnp
    from ecloop_tpu import ecc, fel, pallas_kernels
    from ecloop_tpu.search.mul import build_gtable, window_indices

    batches = [int(a) for a in sys.argv[1:]] or [8192]
    w = 14
    tx, ty = build_gtable(w)
    txT = jnp.asarray(np.asarray(tx).T.copy())     # (16, N) limb planes
    tyT = jnp.asarray(np.asarray(ty).T.copy())
    d = (255 // w) + 1
    n_win = d - 1
    n1 = (1 << w) - 1
    # interleaved x||y rows: one gather serves both coordinates
    txy = jnp.concatenate([tx, ty], axis=1)        # (N, 32)
    # bf16 8-bit planes for the one-hot MXU gather: limb k -> lo, hi
    # bytes (both <= 255, exact in bf16); (d, n1, 64) per-window slabs
    t8 = np.zeros((d, n1, 64), np.float32)
    for k in range(16):
        xv = np.asarray(tx).reshape(d, n1, 16)[:, :, k]
        yv = np.asarray(ty).reshape(d, n1, 16)[:, :, k]
        t8[:, :, 2 * k] = xv & 0xFF
        t8[:, :, 2 * k + 1] = xv >> 8
        t8[:, :, 32 + 2 * k] = yv & 0xFF
        t8[:, :, 32 + 2 * k + 1] = yv >> 8
    t8 = jnp.asarray(t8, dtype=jnp.bfloat16)

    def timeit(name, fn, *args, iters=10):
        r = jax.jit(fn)
        t0 = time.monotonic()
        out = r(*args)
        jax.block_until_ready(out)
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(iters):
            out = r(*args)
        jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / iters
        print(f"  {name:8s}: {dt * 1e3:9.3f} ms/call "
              f"({dt / n_win * 1e3:7.3f} ms/window; compile {compile_s:.0f}s)",
              flush=True)
        return dt

    for batch in batches:
        print(f"batch {batch}:", flush=True)
        bshape = (batch // 1024, 8, 128)
        idx = jnp.asarray(window_indices(
            [(0x1234567 + i) * 0x9E3779B97F4A7C15 % ((1 << 255))
             for i in range(batch)], w).T)

        def t3(rows):
            return tuple(r.reshape(bshape) for r in rows)

        zero = fel.const_rows(0, bshape)
        one = fel.const_rows(1, bshape)
        gfix = (t3(fel.from_last(jnp.take(tx, idx[0] % 977, axis=0))),
                t3(fel.from_last(jnp.take(ty, idx[0] % 977, axis=0))))

        def scan_gather(idx):
            def body(carry, idx_i):
                gx = fel.from_last(jnp.take(tx, jnp.maximum(idx_i, 0),
                                            axis=0))
                gy = fel.from_last(jnp.take(ty, jnp.maximum(idx_i, 0),
                                            axis=0))
                acc = tuple(c + a.reshape(bshape) + b.reshape(bshape)
                            for c, a, b in zip(carry, gx, gy))
                return acc, None
            out, _ = jax.lax.scan(body, zero, idx[:-1])
            return out

        def scan_gatherT(idx):
            def body(carry, idx_i):
                i = jnp.maximum(idx_i, 0)
                gx = tuple(txT[k][i].reshape(bshape) for k in range(16))
                gy = tuple(tyT[k][i].reshape(bshape) for k in range(16))
                acc = tuple(c + a + b for c, a, b in zip(carry, gx, gy))
                return acc, None
            out, _ = jax.lax.scan(body, zero, idx[:-1])
            return out

        def scan_gatherXY(idx):
            def body(carry, idx_i):
                g = fel.from_last(
                    jnp.take(txy, jnp.maximum(idx_i, 0), axis=0)
                    .reshape(-1, 2, 16))
                acc = tuple(c + v.sum(axis=1).reshape(bshape)
                            for c, v in zip(carry, g))
                return acc, None
            out, _ = jax.lax.scan(body, zero, idx[:-1])
            return out

        def scan_gatherMXU(idx):
            # windows are scanned with a per-window table slab, so the
            # digit index within the slab is idx_i - n1*i (precomputed
            # host-side normally; here derived in-graph from the scan
            # counter passed via xs)
            def body(carry, xs):
                i, idx_i = xs
                dig = jnp.maximum(idx_i, 0) - n1 * i      # 0..n1-1
                oh = jax.nn.one_hot(dig, n1, dtype=jnp.bfloat16)
                g = jnp.dot(oh, t8[i],
                            preferred_element_type=jnp.float32)
                gu = g.astype(jnp.uint32)                  # (B, 64)
                limbs = tuple(
                    (gu[:, 2 * k] | (gu[:, 2 * k + 1] << 8)
                     ).reshape(bshape) for k in range(16))
                limbs2 = tuple(
                    (gu[:, 32 + 2 * k] | (gu[:, 32 + 2 * k + 1] << 8)
                     ).reshape(bshape) for k in range(16))
                acc = tuple(c + a + b
                            for c, a, b in zip(carry, limbs, limbs2))
                return acc, None
            iw = jnp.arange(idx.shape[0] - 1, dtype=jnp.int32)
            out, _ = jax.lax.scan(body, zero, (iw, idx[:-1]))
            return out

        def scan_padd(idx):
            def body(carry, idx_i):
                skip = (idx_i < 0).reshape(bshape)
                return pallas_kernels.proj_add_affine_pallas(
                    *carry, *gfix, skip, False), None
            out, _ = jax.lax.scan(body, (zero, one, zero), idx[:-1])
            return out

        def scan_xadd(idx):
            def body(carry, idx_i):
                qx, qy, qz = carry
                nx, ny, nz = ecc.proj_add_affine_rows(
                    qx, qy, qz, *gfix, complete=False)
                skip = (idx_i < 0).reshape(bshape)
                return (fel.select(skip, qx, nx), fel.select(skip, qy, ny),
                        fel.select(skip, qz, nz)), None
            out, _ = jax.lax.scan(body, (zero, one, zero), idx[:-1])
            return out

        def scan_full(idx):
            def body(carry, idx_i):
                gx = t3(fel.from_last(jnp.take(tx, jnp.maximum(idx_i, 0),
                                               axis=0)))
                gy = t3(fel.from_last(jnp.take(ty, jnp.maximum(idx_i, 0),
                                               axis=0)))
                skip = (idx_i < 0).reshape(bshape)
                return pallas_kernels.proj_add_affine_pallas(
                    *carry, gx, gy, skip, False), None
            out, _ = jax.lax.scan(body, (zero, one, zero), idx[:-1])
            return out

        def scan_fullT(idx):
            def body(carry, idx_i):
                i = jnp.maximum(idx_i, 0)
                gx = tuple(txT[k][i].reshape(bshape) for k in range(16))
                gy = tuple(tyT[k][i].reshape(bshape) for k in range(16))
                skip = (idx_i < 0).reshape(bshape)
                return pallas_kernels.proj_add_affine_pallas(
                    *carry, gx, gy, skip, False), None
            out, _ = jax.lax.scan(body, (zero, one, zero), idx[:-1])
            return out

        def tail(qx, qy, qz):
            zflat = tuple(r.reshape(-1) for r in qz)
            zinv = t3(pallas_kernels.inv_mod_batch_pallas(zflat))
            ax = fel.mul_mod(qx, zinv)
            ay = fel.mul_mod(qy, zinv)
            h = pallas_kernels.addr33_hash_rows_pallas(ax, ay)
            return h

        sel = [p.strip() for p in os.environ.get(
            "PARTS", "gather,gatherXY,gatherMXU,padd,full,tail").split(",")]
        all_parts = {
            "gather": (scan_gather, (idx,)),
            "gatherT": (scan_gatherT, (idx,)),
            "gatherXY": (scan_gatherXY, (idx,)),
            "gatherMXU": (scan_gatherMXU, (idx,)),
            "padd": (scan_padd, (idx,)),
            "xadd": (scan_xadd, (idx,)),
            "full": (scan_full, (idx,)),
            "fullT": (scan_fullT, (idx,)),
            "tail": (tail, (gfix[0], gfix[1], one)),
        }
        for name in sel:
            fn, args = all_parts[name]
            timeit(name, fn, *args)


if __name__ == "__main__":
    main()
