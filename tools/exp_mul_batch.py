#!/usr/bin/env python3
"""Steady-state mul-mode device rate vs batch size (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp
    import random
    from ecloop_tpu import filters
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.search.mul import MulSearch

    filt = filters.load_filter("data/btc-bw-hash")
    cfg = SearchConfig(range_s=0, range_e=1 << 255, addr33=True, addr65=True)
    random.seed(7)

    for batch in (int(v) for v in
                  os.environ.get("BATCHES", "2048,8192,16384").split(",")):
        w = int(os.environ.get("W", "14"))
        eng = MulSearch(cfg, filt, w=w, batch=batch)
        keys = [random.randrange(1, 1 << 256) for _ in range(batch)]
        t0 = time.time()
        idx0 = None
        from ecloop_tpu.search.mul import window_digits
        idx = window_digits(keys, eng.w)
        m = eng.step_fn(jnp.asarray(idx.T), eng.txy, eng.bits)
        np.asarray(m)
        print(f"batch {batch}: first step (compile) {time.time()-t0:.1f}s",
              flush=True)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            m = eng.step_fn(jnp.asarray(idx.T), eng.txy, eng.bits)
        np.asarray(m)
        per = (time.time() - t0) / iters
        print(f"batch {batch}: {per*1e3:8.2f} ms/step -> "
              f"{batch/per/1e3:8.1f} kkeys/s (device)", flush=True)

        # end-to-end through run_lines exactly as the CLI streams it:
        # one batch-sized chunk per call with drain=False, so chunk
        # i+1's host parse overlaps chunk i's device step
        lines = [f"{random.randrange(1, 1 << 255):064x}"
                 for _ in range(batch * 8)]
        eng.run_lines(lines[:batch])        # warm
        t0 = time.time()
        for off in range(0, len(lines), batch):
            eng.run_lines(lines[off:off + batch], drain=False)
        eng.flush()
        per = (time.time() - t0)
        print(f"batch {batch}: end-to-end {len(lines)/per/1e3:8.1f} kkeys/s "
              f"(hex lines, CLI-style streaming)", flush=True)


if __name__ == "__main__":
    main()
