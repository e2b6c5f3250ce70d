#!/usr/bin/env python3
"""Experiment: add-step geometry sweep on TPU.

For (centers M, group K, lanes L) configs: compile time, steady-state
keys/s, plus a breakdown run (inversion-only and hash-only variants) to
locate the bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import fe, filters, golden
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.search.add import AddSearch

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    filt = filters.load_filter(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "btc-puzzles-hash"))

    endo = bool(int(os.environ.get("ECLOOP_SWEEP_ENDO", "0")))
    spc = int(os.environ.get("ECLOOP_SWEEP_SPC", "1"))
    mult = 6 if endo else 1

    configs = [tuple(int(v) for v in c.split("x"))
               for c in (sys.argv[1] if len(sys.argv) > 1 else
                         "16x1024x1024,32x4096x1024,64x8192x2048,"
                         "64x8192x8192").split(",")]

    for m, k, lanes in configs:
        cfg = SearchConfig(range_s=0x100000000, range_e=0x200000000,
                           addr33=True, endo=endo, centers=m, group_k=k,
                           lanes=lanes, steps_per_call=spc)
        t0 = time.time()
        eng = AddSearch(cfg, filt, init="host")
        cx, cy = eng._init_centers(cfg.range_s)
        t_setup = time.time() - t0
        t0 = time.time()
        cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                    eng.dpy, eng.bits)
        np.asarray(masks)   # real execution barrier (block_until_ready
        t_compile = time.time() - t0  # is unreliable through the tunnel)
        steps = max(4, int(3e7) // (m * k * spc * mult))
        t0 = time.time()
        for _ in range(steps):
            cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                        eng.dpy, eng.bits)
        np.asarray(masks)
        np.asarray(cx)
        dt = time.time() - t0
        rate = steps * m * k * spc * mult / dt / 1e6
        print(f"M={m:4d} K={k:5d} L={lanes:5d} spc={spc} endo={int(endo)}: "
              f"setup={t_setup:5.1f}s compile={t_compile:6.1f}s "
              f"rate={rate:9.2f} Mkeys/s "
              f"({dt/steps*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
