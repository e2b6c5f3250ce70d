#!/usr/bin/env python3
"""Warm the mul-mode compile cache for the golden-vector stage.

Builds MulSearch with EXACTLY the golden `make mul` configuration
(filter data/btc-bw-hash, -a cu, the CLI's default batch) and runs one
dummy job, so the persistent XLA cache holds the production graph and
the mul_vector evidence stage measures execution, not compilation."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.monotonic()


def main():
    import ecloop_tpu
    ecloop_tpu.enable_compile_cache()
    import numpy as np
    from ecloop_tpu import filters
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.search.mul import MulSearch

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    filt = filters.load_filter(os.path.join(root, "data", "btc-bw-hash"))
    cfg = SearchConfig(addr33=True, addr65=True)
    # must match cmd_mul's default so the vector stage hits this cache
    batch = int(os.environ.get("ECLOOP_MUL_BATCH", "32768"))
    eng = MulSearch(cfg, filt, batch=batch)
    print(f"[{time.monotonic() - T0:6.1f}s] engine up (batch {batch}); "
          f"compiling", flush=True)
    found = eng.run_keys([0x1000 + i for i in range(batch)])
    print(f"[{time.monotonic() - T0:6.1f}s] mul graph warm "
          f"(dummy job: {len(found)} hits, {eng.k_checked} checked)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
