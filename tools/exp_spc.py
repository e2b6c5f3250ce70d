#!/usr/bin/env python3
"""Experiment: steps_per_call sweep of the production add step on TPU.

Per-dispatch latency through the axon tunnel is ~27 ms (measured in
tools/exp_prod_breakdown.py); at spc=1 the 15 ms/step headline is
dispatch-bound, so folding T steps into one dispatch via lax.scan
(cfg.steps_per_call) is the primary single-chip lever.

Usage: SPCS="1 8 32" STEPS=256 python tools/exp_spc.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ecloop_tpu import filters
    from ecloop_tpu.search import SearchConfig, AddSearch

    filt = filters.load_filter(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "btc-puzzles-hash"))
    spcs = [int(s) for s in os.environ.get("SPCS", "8 32").split()]
    total_steps = int(os.environ.get("STEPS", 256))
    centers = int(os.environ.get("CENTERS", 32))
    group_k = int(os.environ.get("K", 4096))
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"geometry {centers}x{group_k}", flush=True)

    for spc in spcs:
        cfg = SearchConfig(range_s=0x100000000, range_e=0x200000000,
                           addr33=True, addr65=False, endo=True,
                           centers=centers, group_k=group_k, lanes=4096,
                           steps_per_call=spc)
        eng = AddSearch(cfg, filt, init="host")
        cx, cy = eng._init_centers(cfg.range_s)
        t0 = time.monotonic()
        cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                    eng.dpy, eng.bits)
        np.asarray(masks)
        tc = time.monotonic() - t0
        calls = max(2, total_steps // spc)
        t0 = time.monotonic()
        for _ in range(calls):
            cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                        eng.dpy, eng.bits)
        np.asarray(masks)
        np.asarray(cx)
        dt = time.monotonic() - t0
        keys = calls * spc * cfg.keys_per_step * 6
        print(f"spc={spc:3d}: compile {tc:7.1f}s, {calls} calls in "
              f"{dt:6.2f}s -> {keys / dt / 1e6:8.1f} Mkeys/s "
              f"({dt / calls / spc * 1e3:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
