#!/usr/bin/env python3
"""Experiment: hash160 + device-prefilter forms on TPU, fori-amortized.

Rows (each R iterations inside one jitted fori_loop, chained carries,
forced by host fetch — per-dispatch tunnel latency ~2.3 ms pipelined
would otherwise dominate):

  addr33 XLA | addr33 Pallas | pow2 probe x1/x2 | cmp probe K=160/1080 |
  hash+probe fused (XLA+cmp, the production variant-loop body)

Usage: B=131072 R=64 python tools/exp_hash_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ecloop_tpu import bloom, hash160, pallas_kernels

    B = int(os.environ.get("B", 131072))
    R = int(os.environ.get("R", 64))
    shape = (B // 1024, 8, 128)
    rng = np.random.default_rng(9)

    def rand_rows():
        return tuple(jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
            for _ in range(16))

    a, b = rand_rows(), rand_rows()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"B={B} R={R}", flush=True)

    def timed(label, body, x, r=R):
        def fn(x_):
            def it(_, v):
                return body(v)
            return jax.lax.fori_loop(0, r, it, x_)
        f = jax.jit(fn)
        t0 = time.time()
        out = f(x)
        np.asarray(out[0])
        tc = time.time() - t0
        t0 = time.time()
        out = f(out)
        np.asarray(out[0])
        dt = (time.time() - t0) / r
        print(f"{label:40s}: {dt * 1e6:9.1f} us/iter  "
              f"{B / dt / 1e6:9.1f} Melem/s  (compile {tc:.1f}s)",
              flush=True)
        return dt

    m16 = np.uint32(0xFFFF)

    def fold(x, words):
        return tuple((r ^ (words[i % len(words)] & m16))
                     for i, r in enumerate(x))

    # hash forms
    timed("addr33 XLA rows",
          lambda x: fold(x, hash160.addr33_hash_rows(x, b)), a)
    timed("addr33 Pallas fused",
          lambda x: fold(x, pallas_kernels.addr33_hash_rows_pallas(x, b)), a)
    timed("addr65 XLA rows",
          lambda x: fold(x, hash160.addr65_hash_rows(x, b)), a, r=R // 2)
    timed("addr65 Pallas fused",
          lambda x: fold(x, pallas_kernels.addr65_hash_rows_pallas(x, b)),
          a, r=R // 2)

    # probe forms
    bits = jnp.asarray(np.asarray(
        rng.integers(0, 1 << 32, size=1 << 11, dtype=np.uint64))
        .astype(np.uint32))
    for np_ in (1, 2):
        timed(f"pow2 probe x{np_}",
              lambda x, np_=np_: fold(x, [bloom.probe_pow2(
                  list(x[:5]), bits, log2_bits=16,
                  nprobes=np_).astype(jnp.uint32)]), a)
    for k in (160, 1080):
        t0 = jnp.asarray(rng.integers(0, 1 << 32, size=k, dtype=np.uint32))
        timed(f"cmp probe K={k}",
              lambda x, t0=t0: fold(x, [
                  (x[0][..., None] == t0).any(-1).astype(jnp.uint32)]), a)

    # production variant body: hash -> probe (fused by XLA)
    t0 = jnp.asarray(rng.integers(0, 1 << 32, size=160, dtype=np.uint32))

    def body_cmp(x):
        h = hash160.addr33_hash_rows(x, b)
        hit = (h[0][..., None] == t0).any(-1)
        return fold(x, [hit.astype(jnp.uint32)])

    def body_pow2(x):
        h = hash160.addr33_hash_rows(x, b)
        hit = bloom.probe_pow2(h, bits, log2_bits=16, nprobes=2)
        return fold(x, [hit.astype(jnp.uint32)])
    timed("hash+cmp probe (production body)", body_cmp, a)
    timed("hash+pow2x2 probe (old body)", body_pow2, a)


if __name__ == "__main__":
    main()
