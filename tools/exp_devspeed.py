#!/usr/bin/env python3
"""Experiment: raw device speed — MXU matmul, VPU int vs float
elementwise — strictly chained."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(f, x, iters):
    import numpy as np
    y = f(x)
    np.asarray(y.ravel()[:1])
    t0 = time.time()
    for _ in range(iters):
        x = f(x)
    np.asarray(x.ravel()[:1])
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # 1. MXU: bf16 matmul 4096^3
    n = 4096
    a = jnp.ones((n, n), dtype=jnp.bfloat16)

    def mm(x):
        return jnp.dot(x, a, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(1e-3)
    dt = chain(jax.jit(mm), a, 8)
    print(f"bf16 matmul {n}^3: {dt*1e3:.2f} ms -> "
          f"{2*n**3/dt/1e12:.1f} TFLOP/s", flush=True)

    # 2. elementwise ops at 16M elements
    B = 1 << 24
    xi = jnp.arange(B, dtype=jnp.uint32).reshape(-1, 128)
    xs = xi.astype(jnp.int32)
    xf = xi.astype(jnp.float32)

    def rep(op, n=8):
        def f(x):
            for _ in range(n):
                x = op(x)
            return x
        return f

    for name, x0, op in [
        ("u32 mul", xi, lambda x: x * np.uint32(0x9E3779B1) + np.uint32(1)),
        ("s32 mul", xs, lambda x: x * np.int32(0x1E3779B1) + np.int32(1)),
        ("u32 add/xor/shr chain(3ops)", xi,
         lambda x: (x + np.uint32(0x85EBCA6B)) ^ (x >> np.uint32(13))),
        ("u32 shift-or rot", xi,
         lambda x: (x << np.uint32(7)) | (x >> np.uint32(25))),
        ("f32 mul+add", xf, lambda x: x * np.float32(1.000001) + np.float32(1.0)),
        ("u16 mul (u32 lanes &0xffff)", xi,
         lambda x: ((x & np.uint32(0xFFFF)) * np.uint32(0x9E37)) + np.uint32(1)),
    ]:
        dt = chain(jax.jit(rep(op)), x0, 8)
        print(f"{name:34s}: {dt*1e3:7.2f} ms/8ops/16M -> "
              f"{8*B/dt/1e9:8.1f} Gop/s", flush=True)


if __name__ == "__main__":
    main()
