#!/usr/bin/env python3
"""Experiment: VPU op-throughput slope — time a fused chain of K
dependent elementwise ops for several K; slope gives true per-op rate,
intercept gives kernel/bandwidth overhead."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    for B in (1 << 20, 1 << 24):
        x0 = jnp.arange(B, dtype=jnp.uint32).reshape(-1, 128)
        xf0 = x0.astype(jnp.float32)
        for name, x_init, mk in (
            ("u32 mul+add(2op)", x0,
             lambda x: x * np.uint32(0x9E3779B1) + np.uint32(12345)),
            ("f32 fma(1op)", xf0,
             lambda x: x * np.float32(1.0000001) + np.float32(1.0)),
        ):
            times = {}
            for K in (4, 32, 128):
                def f(x, K=K):
                    for _ in range(K):
                        x = mk(x)
                    return x
                jf = jax.jit(f)
                y = jf(x_init)
                np.asarray(y.ravel()[:1])
                iters = 6
                t0 = time.time()
                x = x_init
                for _ in range(iters):
                    x = jf(x)
                np.asarray(x.ravel()[:1])
                times[K] = (time.time() - t0) / iters
            slope = (times[128] - times[4]) / (128 - 4)   # sec per fused op
            rate = B / slope / 1e9
            print(f"B={B >> 20}M {name:18s}: K4={times[4]*1e3:.2f}ms "
                  f"K32={times[32]*1e3:.2f}ms K128={times[128]*1e3:.2f}ms "
                  f"-> {rate:8.1f} G primitive-ops/s", flush=True)


if __name__ == "__main__":
    main()
