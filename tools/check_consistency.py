#!/usr/bin/env python3
"""Cross-configuration consistency harness.

Counterpart of the reference's _check.py (SURVEY.md §2.7/§4.4), which
verified bit-identical found-sets across hosts/compilers via ssh.  Here
the equivalent risk surface is device count and batch geometry: this
harness runs the same search under several (devices x geometry) configs
on a virtual CPU mesh and diffs the found key sets and counters.

Usage: python tools/check_consistency.py [--quick]
Exit 0 iff every config produces the identical found set.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      (os.environ.get("XLA_FLAGS", "") +
                       " --xla_force_host_platform_device_count=8").strip())

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ecloop_tpu import filters, golden
    from ecloop_tpu.search.add import AddSearch
    from ecloop_tpu.search.common import SearchConfig
    from ecloop_tpu.parallel.mesh import ShardedAddSearch, make_mesh

    targets = [0x80000 + 3, 0x80000 + 0x1F7, 0x80000 + 0x3FE]
    rows = [np.frombuffer(golden.addr33(golden.point_mul(k)),
                          dtype=">u4").astype(np.uint32) for k in targets]
    filt = filters.filter_from_hashes(np.stack(rows))

    base_kwargs = dict(range_s=0x80000, range_e=0x80400, addr33=True)
    configs = [
        ("1dev geomA", None, dict(centers=4, group_k=64, lanes=64)),
        ("1dev geomB", None, dict(centers=8, group_k=32, lanes=32)),
        ("2dev", 2, dict(centers=8, group_k=32, lanes=32)),
        ("8dev", 8, dict(centers=8, group_k=32, lanes=32)),
    ]
    if "--quick" in sys.argv:
        configs = configs[:2]

    results = {}
    for name, ndev, geom in configs:
        cfg = SearchConfig(**base_kwargs, **geom)
        if ndev is None:
            eng = AddSearch(cfg, filt, init="host")
            found = eng.run_span(cfg.range_s, 0x400)
        else:
            mesh = make_mesh(jax.devices()[:ndev])
            eng = ShardedAddSearch(cfg, filt, mesh, init="host")
            found = eng.run_span(cfg.range_s, 0x400)
        results[name] = sorted((f.label, f.priv) for f in found)
        print(f"{name:12s}: {len(found)} found")

    expect = sorted(("addr33", t) for t in targets)
    ok = all(v == expect for v in results.values())
    if not ok:
        for name, v in results.items():
            if v != expect:
                print(f"MISMATCH in {name}: {v} != {expect}")
        return 1
    print("OK: identical add-mode found-set across all configs")

    # --- mul mode: single-device vs sharded over the mesh ---------------
    from ecloop_tpu.search.mul import MulSearch
    from ecloop_tpu.parallel.mesh import ShardedMulSearch

    mkeys = [3, 0xDEADBEEF, 0x123456789ABCDEF, golden.N - 5]
    mrows = [np.frombuffer(golden.addr33(golden.point_mul(k)),
                           dtype=">u4").astype(np.uint32) for k in mkeys]
    mfilt = filters.filter_from_hashes(np.stack(mrows))
    probe = mkeys + [0x999, 0x777, 0xABCDEF]

    mul_configs = [("1dev", None, 32), ("2dev", 2, 64), ("8dev", 8, 256)]
    if "--quick" in sys.argv:
        mul_configs = mul_configs[:1]
    mres = {}
    for name, ndev, batch in mul_configs:
        cfg = SearchConfig(addr33=True, centers=4, group_k=64, lanes=64)
        if ndev is None:
            eng = MulSearch(cfg, mfilt, w=8, batch=batch, init="host")
        else:
            mesh = make_mesh(jax.devices()[:ndev])
            eng = ShardedMulSearch(cfg, mfilt, mesh, w=8, batch=batch,
                                   init="host")
        found = eng.run_keys(probe)
        mres[name] = sorted((f.label, f.priv) for f in found)
        print(f"mul {name:8s}: {len(found)} found, "
              f"k_checked {eng.k_checked}")

    mexpect = sorted(("addr33", k) for k in mkeys)
    ok = all(v == mexpect for v in mres.values())
    if not ok:
        for name, v in mres.items():
            if v != mexpect:
                print(f"MISMATCH in mul {name}: {v} != {mexpect}")
        return 1
    print("OK: identical mul-mode found-set across all configs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
