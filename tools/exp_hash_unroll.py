#!/usr/bin/env python3
"""Experiment: hash160 round-loop structure (scan vs unroll) on TPU.

Times compile + steady-state throughput of addr33_hash at a given batch.
Usage: ECLOOP_HASH_UNROLL={0|1} python tools/exp_hash_unroll.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import fe, golden, hash160

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    mode = "unroll" if hash160._unroll_default() else "scan"
    pts = [golden.point_mul(k) for k in range(2, 66)]
    reps = B // 64
    x = jnp.asarray(np.tile(fe.ints_to_limbs([p[0] for p in pts]), (reps, 1)))
    y = jnp.asarray(np.tile(fe.ints_to_limbs([p[1] for p in pts]), (reps, 1)))

    def chain(x, y):
        # 4 dependent hash rounds to amortize dispatch
        h = hash160.addr33_hash(x, y)
        for _ in range(3):
            h = hash160.addr33_hash(x ^ (h[..., :1] & 1), y)
        return h

    t0 = time.time()
    f = jax.jit(chain)
    out = jax.block_until_ready(f(x, y))
    t_compile = time.time() - t0

    t0 = time.time()
    iters = 10
    for _ in range(iters):
        out = f(x, y)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rate = 4 * B * iters / dt / 1e6
    print(f"mode={mode} B={B} backend={jax.default_backend()} "
          f"compile={t_compile:.1f}s rate={rate:.2f} Mhash/s", flush=True)

    # correctness spot check
    h = np.asarray(jax.jit(hash160.addr33_hash)(x[:4], y[:4]))
    for i in range(4):
        assert hash160.h160_to_hex(h[i])[0] == golden.addr33(pts[i]).hex(), i
    print("correct", flush=True)


if __name__ == "__main__":
    main()
