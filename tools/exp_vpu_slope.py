#!/usr/bin/env python3
"""Experiment: true VPU op-throughput — time deep chains of DEPENDENT
elementwise ops for two chain lengths; the slope isolates compute from
dispatch/tunnel overhead.

Methodology notes (learned the hard way in rounds 2-3):
  * chains of ops with a CONSTANT operand (x*c, x+c, x>>k, x^c) are
    algebraically folded by XLA across the whole unrolled chain — the
    round-2 version measured nothing but folding artifacts (negative
    slopes).  Every chain here is data-dependent and unfoldable.
  * jax.block_until_ready is unreliable through the axon device tunnel;
    only a host fetch (np.asarray of a slice) actually forces the chain.

Round-3 result on TPU v5e (0.94 GHz, 8x128 lanes):
  u32 x=x*x+c / x=x^(x>>1) / (x*x)&mask and f32 x=x*x+c all sustain
  ~315 G chain-steps/s = ~740 G primitive-ops/s ~= 0.77 ops/lane/cycle.
  => the VPU issues ~1 int32 op per lane per cycle for this op mix; the
  4-ALUs-per-lane assumption (3.85 T) was 4x optimistic.  sol.py's peak
  model uses 1 op/lane/cycle accordingly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = int(os.environ.get("B", 1 << 24))
    x0 = jnp.arange(B, dtype=jnp.uint32).reshape(-1, 128)

    def force(x):
        np.asarray(x.ravel()[:8])

    def measure(name, mk, ops_per, Ks=(64, 512), iters=8):
        times = {}
        for K in Ks:
            def f(x, K=K):
                for _ in range(K):
                    x = mk(x)
                return x
            jf = jax.jit(f)
            force(jf(x0))                      # compile + warm
            t0 = time.time()
            cur = x0
            for _ in range(iters):
                cur = jf(cur)
            force(cur)
            times[K] = (time.time() - t0) / iters
        slope = (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])
        rate = B * ops_per / slope / 1e9
        print(f"{name:24s}: K{Ks[0]}={times[Ks[0]]*1e3:7.2f}ms "
              f"K{Ks[1]}={times[Ks[1]]*1e3:7.2f}ms -> {rate:7.1f} G ops/s "
              f"({rate / 1e3 / (8 * 128 * 0.94):.2f} ops/lane/cycle @v5e)",
              flush=True)

    measure("u32 x=x*x+c", lambda x: x * x + np.uint32(123), 2)
    measure("u32 x=x^(x>>1)", lambda x: x ^ (x >> np.uint32(1)), 2)
    measure("u32 x=(x*x)&mask", lambda x: (x * x) & np.uint32(0xFFFF), 2)

    def mkf(x):
        return x * x + np.float32(0.1)

    xf0 = x0.astype(jnp.float32) / np.float32(1e9)
    times = {}
    for K in (64, 512):
        def f(x, K=K):
            for _ in range(K):
                x = mkf(x)
            return x
        jf = jax.jit(f)
        force(jf(xf0))
        t0 = time.time()
        cur = xf0
        for _ in range(8):
            cur = jf(cur)
        force(cur)
        times[K] = (time.time() - t0) / 8
    slope = (times[512] - times[64]) / 448
    rate = B * 2 / slope / 1e9
    print(f"{'f32 x=x*x+c':24s}: K64={times[64]*1e3:7.2f}ms "
          f"K512={times[512]*1e3:7.2f}ms -> {rate:7.1f} G ops/s", flush=True)


if __name__ == "__main__":
    main()
