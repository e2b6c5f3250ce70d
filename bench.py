"""Headline benchmark: hash160-checked keys/sec on one chip (add mode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published end-to-end add-mode throughput,
10.73 Mkeys/s on an Intel N100 with 4 threads (whole machine;
/root/reference/readme.md:210-211, BASELINE.md).

Run on TPU by default (the axon device); ECLOOP_BENCH_CPU=1 forces CPU.
Geometry is tunable via env: ECLOOP_BENCH_CENTERS/K/LANES/STEPS.
"""

import json
import os
import sys
import time

BASELINE_KEYS_PER_SEC = 10.73e6


def main() -> int:
    import jax

    if os.environ.get("ECLOOP_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent cache (TPU only — XLA:CPU cached AOT executables
        # intermittently segfault on reload on this host)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    from ecloop_tpu import filters
    from ecloop_tpu.search import SearchConfig, AddSearch

    centers = int(os.environ.get("ECLOOP_BENCH_CENTERS", 32))
    group_k = int(os.environ.get("ECLOOP_BENCH_K", 4096))
    lanes = int(os.environ.get("ECLOOP_BENCH_LANES", 4096))
    steps = int(os.environ.get("ECLOOP_BENCH_STEPS", 24))
    # endo on by default: it is the engine's best configuration (6
    # genuinely hash160-checked candidates per EC point, same counter
    # semantics as the reference's -endo, main.c:300-346) and measured
    # faster end-to-end (56.5M vs 43.9M keys/s on one v5e chip).
    endo = bool(int(os.environ.get("ECLOOP_BENCH_ENDO", "1")))

    import numpy as _np
    filt = filters.load_filter(os.environ.get(
        "ECLOOP_BENCH_FILTER",
        os.path.join(os.path.dirname(__file__), "data", "btc-puzzles-hash")))
    spc = int(os.environ.get("ECLOOP_BENCH_SPC", 8))
    cfg = SearchConfig(range_s=0x100000000, range_e=0x200000000,
                       addr33=True, addr65=False, endo=endo,
                       centers=centers, group_k=group_k, lanes=lanes,
                       steps_per_call=spc)
    eng = AddSearch(cfg, filt, init="host")
    cx, cy = eng._init_centers(cfg.range_s)

    # warmup: compile + one step (forced with a real host fetch —
    # block_until_ready is not a reliable execution barrier on every
    # backend/tunnel, a data fetch is)
    cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx, eng.dpy,
                                eng.bits)
    _np.asarray(masks)

    t0 = time.time()
    for _ in range(steps):
        cx, cy, masks = eng.step_fn(cx, cy, eng.tx, eng.ty, eng.dpx,
                                    eng.dpy, eng.bits)
    _np.asarray(masks)      # forces the whole chained sequence
    _np.asarray(cx)
    dt = time.time() - t0

    per_key_mult = 6 if endo else 1
    keys = steps * spc * cfg.keys_per_step * per_key_mult
    rate = keys / dt
    print(json.dumps({
        "metric": "hash160-checked keys/sec/chip (add mode%s)"
                  % (", endo" if endo else ""),
        "value": round(rate),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_KEYS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
