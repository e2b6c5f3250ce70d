#!/usr/bin/env python3
"""Diagnose mul-mode startup cost: stage-by-stage timestamps for
filter load, gtable build, step compile/load, and steady-state rate."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def mark(label):
    print(f"[{time.time() - T0:8.1f}s] {label}", flush=True)


def main():
    import numpy as np
    mark("python up")
    import jax
    mark("jax imported")
    from ecloop_tpu import filters
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.search.mul import MulSearch, build_gtable, window_digits

    filt = filters.load_filter("data/btc-bw-hash")
    mark("filter loaded")

    tx, ty = build_gtable(14, 4096, "auto")
    mark("gtable built (lazy)")
    np.asarray(tx[:1])
    mark("gtable materialized")

    cfg = SearchConfig(range_s=0, range_e=1 << 255, addr33=True, addr65=True)
    eng = MulSearch(cfg, filt)
    mark("engine constructed")

    import random
    random.seed(7)
    keys = [random.randrange(1, 1 << 256) for _ in range(eng.batch)]
    t = time.time()
    idx = window_digits(keys, eng.w)
    mark(f"window_digits({eng.batch} keys): {time.time() - t:.3f}s")

    import jax.numpy as jnp
    m = eng.step_fn(jnp.asarray(idx.T), eng.txy, eng.bits)
    np.asarray(m)
    mark("first step done (compile/load + run)")

    t = time.time()
    iters = 10
    for _ in range(iters):
        m = eng.step_fn(jnp.asarray(idx.T), eng.txy, eng.bits)
    np.asarray(m)
    per = (time.time() - t) / iters
    mark(f"steady step: {per * 1e3:.1f} ms -> "
         f"{eng.batch / per / 1e3:.1f} kkeys/s (device only)")

    t = time.time()
    for _ in range(iters):
        eng.run_keys(keys)
    per = (time.time() - t) / iters
    mark(f"run_keys: {per * 1e3:.1f} ms -> "
         f"{eng.batch / per / 1e3:.1f} kkeys/s (host+device sync)")


if __name__ == "__main__":
    main()
