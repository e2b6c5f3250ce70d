#!/usr/bin/env python3
"""Experiment: component breakdown of the add-step on TPU with STRICT
chained timing (every iteration data-depends on the previous; final
np.asarray forces the whole chain — immune to broken block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, x, iters, label, elems):
    import numpy as np
    out = f(x)
    np.asarray(out if not isinstance(out, tuple) else out[0])  # compile
    t0 = time.time()
    for _ in range(iters):
        x = f(x)
        if isinstance(x, tuple):
            x = x[0]
    np.asarray(x)
    dt = time.time() - t0
    per = dt / iters
    print(f"{label:46s}: {per * 1e3:8.3f} ms/iter  "
          f"{elems / per / 1e6:10.1f} Melem/s", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import ecc, fe, golden, hash160

    B = int(os.environ.get("B", 65536))
    IT = int(os.environ.get("IT", 20))
    rng = np.random.default_rng(3)
    vals = [int.from_bytes(rng.bytes(32), "little") % fe.P for _ in range(256)]
    a = jnp.asarray(np.tile(fe.ints_to_limbs(vals), (B // 256, 1)))
    bvals = [int.from_bytes(rng.bytes(32), "little") % fe.P
             for _ in range(256)]
    b = jnp.asarray(np.tile(fe.ints_to_limbs(bvals), (B // 256, 1)))

    # 8 chained modmuls per call
    def mm8(x):
        for _ in range(8):
            x = fe.mul_mod_p(x, b)
        return x
    timed(jax.jit(mm8), a, IT, f"mul_mod_p x8 (B={B})", 8 * B)

    def sq8(x):
        for _ in range(8):
            x = fe.sqr_mod_p(x)
        return x
    timed(jax.jit(sq8), a, IT, f"sqr_mod_p x8 (B={B})", 8 * B)

    for lanes in (1024, 4096, 16384):
        def invf(x, lanes=lanes):
            return fe.mul_mod_p(fe.inv_mod_p_batch(x, lanes=lanes), b)
        timed(jax.jit(invf), a, max(2, IT // 4),
              f"inv_mod_p_batch (B={B}, lanes={lanes})", B)

    # hash chained
    def h33(x):
        h = hash160.addr33_hash(x, b)
        return x ^ (h[..., :1] & 1), None
    timed(jax.jit(lambda x: h33(x)[0]), a, IT, f"addr33_hash (B={B})", B)

    # chord pair (as in the step): sub, 2x affine_add with given inv
    pts = [golden.point_mul(k) for k in range(2, 258)]
    px = jnp.asarray(np.tile(fe.ints_to_limbs([p[0] for p in pts]),
                             (B // 256, 1)))
    py = jnp.asarray(np.tile(fe.ints_to_limbs([p[1] for p in pts]),
                             (B // 256, 1)))

    def chordpair(x):
        dx = fe.sub_mod(px, x)
        # stand-in inverse (real one benched above); chord math only
        idx = fe.mul_mod_p(dx, b)
        xp, yp = ecc.affine_add(x, a, px, py, idx)
        xm, ym = ecc.affine_add(x, a, px, fe.neg_mod(py), idx)
        return fe.add_mod(xp, xm), None
    timed(jax.jit(lambda x: chordpair(x)[0]), a, IT,
          f"chord pair +1 mul (B={B} pairs)", 2 * B)


if __name__ == "__main__":
    main()
