#!/usr/bin/env python3
"""Experiment: limb-last (B,16) vs limb-first (16,B) layout for the
256-bit modmul, and multi-op-in-one-dispatch scaling."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import fe

    B = int(os.environ.get("B", 65536))
    R = 8
    rng = np.random.default_rng(5)
    av = [int.from_bytes(rng.bytes(32), "little") % fe.P for _ in range(64)]
    bv = [int.from_bytes(rng.bytes(32), "little") % fe.P for _ in range(64)]
    a = jnp.asarray(np.tile(fe.ints_to_limbs(av), (B // 64, 1)))
    b = jnp.asarray(np.tile(fe.ints_to_limbs(bv), (B // 64, 1)))
    aT = jnp.asarray(np.ascontiguousarray(np.asarray(a).T))  # (16, B)
    bT = jnp.asarray(np.ascontiguousarray(np.asarray(b).T))

    # ---- limb-first modmul on (16, B) ----------------------------------
    P_COL = [np.uint32(v) for v in fe.P_LIMBS.tolist()]

    def norm_T(cols):
        """cols: list of (B,) u32 -> carry-propagated 16-bit rows."""
        out = []
        c = jnp.zeros_like(cols[0])
        for v in cols:
            v = v + c
            out.append(v & np.uint32(0xFFFF))
            c = v >> np.uint32(16)
        return out, c

    def mul_wide_T(x, y):
        xs = [x[i] for i in range(16)]
        ys = [y[i] for i in range(16)]
        cols = [None] * 32
        for i in range(16):
            for j in range(16):
                p = xs[i] * ys[j]
                lo, hi = p & np.uint32(0xFFFF), p >> np.uint32(16)
                k = i + j
                cols[k] = lo if cols[k] is None else cols[k] + lo
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        cols, _ = norm_T(cols)
        return cols  # 32 rows

    def fold_T(w):
        lo, hi = w[:16], w[16:]
        cols = [lo[i] + hi[i] * np.uint32(0x03D1)
                + (hi[i - 2] if i >= 2 else 0) for i in range(16)]
        cols += [hi[14] + (w[30] * 0), hi[15]]  # limbs 16,17 from shift-by-2
        # redo precisely: hi*PCOMP = hi*0x3D1 + hi<<32 (2 limbs)
        cols = [None] * 20
        for i in range(16):
            t = hi[i] * np.uint32(0x03D1)
            cols[i] = lo[i] + t if cols[i] is None else cols[i] + lo[i] + t
            k = i + 2
            cols[k] = hi[i] if cols[k] is None else cols[k] + hi[i]
        cols = [jnp.zeros_like(lo[0]) if c is None else c for c in cols]
        r1, _ = norm_T(cols)
        lo, hi = r1[:16], r1[16:]
        cols = list(lo)
        for i in range(4):
            cols[i] = cols[i] + hi[i] * np.uint32(0x03D1)
            cols[i + 2] = cols[i + 2] + hi[i]
        r2, c = norm_T(cols)
        # final borrow-free fold of carry c (< small) back in
        cols = list(r2)
        cols[0] = cols[0] + c * np.uint32(0x03D1)
        cols[2] = cols[2] + c
        r3, _ = norm_T(cols)
        return r3

    def mul_mod_T(x, y):
        return jnp.stack(fold_T(mul_wide_T(x, y)))

    def chainT(x):
        for _ in range(R):
            x = mul_mod_T(x, bT)
        return x

    def chainL(x):
        for _ in range(R):
            x = fe.mul_mod_p(x, b)
        return x

    for name, f, x0 in (("limb-last  (B,16)", jax.jit(chainL), a),
                        ("limb-first (16,B)", jax.jit(chainT), aT)):
        y = f(x0)
        np.asarray(y.ravel()[:1])
        iters = 10
        t0 = time.time()
        x = x0
        for _ in range(iters):
            x = f(x)
        np.asarray(x.ravel()[:1])
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt/R*1e3:7.3f} ms/modmul @B={B} -> "
              f"{B*R/dt/1e6:8.1f} M modmul/s", flush=True)

    # correctness of limb-first path
    got = np.asarray(jax.jit(mul_mod_T)(aT, bT)).T
    want = [(x * y) % fe.P for x, y in
            zip(av * (B // 64), bv * (B // 64))][:64]
    got_i = fe.limbs_to_ints(got[:64])
    assert got_i == want, "limb-first modmul WRONG"
    print("limb-first modmul correct", flush=True)


if __name__ == "__main__":
    main()
