#!/usr/bin/env python3
"""Experiment: isolated throughput of the production (limb-first) step
components on TPU — hash160, chord math, batch inversion — to locate
where the ~24 us/1k-keys step time goes.

Methodology notes (learned the hard way):
  * rows must use the production (X, 8, 128) tiling — flat (B,) rows
    leave 7 of 8 sublanes idle and read ~8x slow;
  * the end-of-loop fetch must be TINY (a few lanes) — np.asarray of a
    full row tuple pulls MBs through the axon tunnel inside the timed
    region and dominates small iteration counts;
  * batch-inversion is measured at the production batch (flat rows,
    tiled internally by the kernel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, x, iters, elems):
    import numpy as np
    y = fn(x)
    np.asarray(y[0][0][..., :1])          # compile + settle (tiny fetch)
    t0 = time.time()
    for _ in range(iters):
        x = fn(x)
    np.asarray(x[0][0][..., :1])          # forces the chain; ~bytes moved
    per = (time.time() - t0) / iters
    print(f"{label:44s}: {per * 1e3:8.3f} ms  "
          f"{elems / per / 1e6:9.1f} Melem/s  "
          f"({per * 1e9 / elems:6.2f} ns/elem)", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import ecc, fe, fel, golden, hash160

    jax.config.update("jax_compilation_cache_dir", "/tmp/ecloop_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    B = int(os.environ.get("B", 131072))
    IT = int(os.environ.get("IT", 30))
    pts = [golden.point_mul(k) for k in range(2, 258)]
    px = np.tile(fe.ints_to_limbs([p[0] for p in pts]), (B // 256, 1))
    py = np.tile(fe.ints_to_limbs([p[1] for p in pts]), (B // 256, 1))
    xf = fel.from_last(jnp.asarray(px))   # flat rows (B,) — for inversion
    yf = fel.from_last(jnp.asarray(py))
    # production tiling: (X, 8, 128) rows
    xr = tuple(r.reshape(-1, 8, 128) for r in xf)
    yr = tuple(r.reshape(-1, 8, 128) for r in yf)

    # --- hash160 (x advanced each iter so iterations chain) -------------
    @jax.jit
    def h33(args):
        x, y = args
        h = hash160.addr33_hash_rows(x, y)
        x = tuple(r ^ (h[0] & 1) for r in x)
        return (x, y)
    timed(f"addr33_hash_rows (B={B})", h33, (xr, yr), IT, B)

    @jax.jit
    def h65(args):
        x, y = args
        h = hash160.addr65_hash_rows(x, y)
        x = tuple(r ^ (h[0] & 1) for r in x)
        return (x, y)
    timed(f"addr65_hash_rows (B={B})", h65, (xr, yr), IT, B)

    # --- chord pair (the EC side of the step) ---------------------------
    @jax.jit
    def chord(args):
        x, y = args
        dx = fel.sub_mod(xr, x)
        inv = fel.mul_mod(dx, yr)            # stand-in for shared inverse
        xp, yp = ecc.affine_add_rows(x, y, xr, yr, inv)
        xm, ym = ecc.affine_add_rows(x, y, xr, fel.neg_mod(yr), inv)
        return (fel.add_mod(xp, xm), fel.add_mod(yp, ym))
    timed(f"chord pair (2 pts/elem) (B={B})", chord, (xr, yr), IT, B)

    # --- modmul chain ----------------------------------------------------
    @jax.jit
    def mm4(args):
        x, y = args
        for _ in range(4):
            x = fel.mul_mod(x, y)
        return (x, y)
    timed(f"fel.mul_mod x4 (B={B})", mm4, (xr, yr), IT, 4 * B)

    # --- batch inversion at the production batch (flat rows) ------------
    from ecloop_tpu import pallas_kernels
    BI = int(os.environ.get("BI", 69632))   # default bench geometry pad
    xfi = tuple(r[:BI] for r in xf)
    yfi = tuple(r[:BI] for r in yf)

    @jax.jit
    def invp(args):
        x, y = args
        return (pallas_kernels.inv_mod_batch_pallas(x), y)
    timed(f"inv_mod_batch PALLAS (B={BI})", invp, (xfi, yfi),
          max(4, IT // 4), BI)

    @jax.jit
    def invx(args):
        x, y = args
        return (fel.inv_mod_batch(x, lanes=4096), y)
    timed(f"inv_mod_batch XLA (B={BI})", invx, (xfi, yfi),
          max(4, IT // 4), BI)


if __name__ == "__main__":
    main()
