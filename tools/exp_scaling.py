#!/usr/bin/env python3
"""Sharding-overhead scaling table on a virtual CPU mesh (VERDICT r4 #6).

Fixed per-device work, growing device count: a perfectly-scaling
sharded step should take ~n x the single-core wall time on ONE host
core (all virtual devices share it), i.e. wall/(n * per-device-work)
stays flat.  What this measures is the sharding machinery's overhead
(collectives, partitioning) — real speedup needs real chips, but a flat
normalized line certifies the shard_map program adds no per-device cost
beyond the compute itself.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/exp_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("ECLOOP_JIT", "1")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from ecloop_tpu import filters, golden
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.parallel.mesh import make_mesh, sharded_step_builder
    from jax.sharding import NamedSharding, PartitionSpec as P

    targets = [np.frombuffer(golden.addr33(golden.point_mul(0x100025)),
                             dtype=">u4").astype(np.uint32)]
    filt = filters.filter_from_hashes(np.stack(targets))

    per_dev_centers = int(os.environ.get("CENTERS_PER_DEV", 2))
    group_k = int(os.environ.get("GROUP_K", 64))
    steps = int(os.environ.get("STEPS", 20))
    counts = [int(c) for c in
              os.environ.get("DEVS", "1,2,4,8").split(",")]

    print(f"# fixed per-device work: {per_dev_centers} centers x "
          f"{group_k} keys; {steps} timed steps; one host core")
    rows = []
    for n in counts:
        devs = jax.devices()[:n]
        if len(devs) < n:
            print(f"n={n}: skipped (only {len(devs)} devices)")
            continue
        mesh = make_mesh(devs)
        cfg = SearchConfig(range_s=0x100000, range_e=0x200000,
                           addr33=True, endo=False,
                           centers=per_dev_centers * n, group_k=group_k,
                           lanes=32)
        from ecloop_tpu.search.add import _cached_table, points_from_scalars
        tx, ty, dpx, dpy = _cached_table(cfg.stride, cfg.group_k,
                                         cfg.keys_per_step, "host")
        h = cfg.group_k // 2
        keys = [(cfg.range_s + (m * cfg.group_k + h) * cfg.stride)
                for m in range(cfg.centers)]
        cx, cy = points_from_scalars(keys, "host")
        sh = NamedSharding(mesh, P("rng"))
        cx, cy = jax.device_put(cx, sh), jax.device_put(cy, sh)
        bits = jnp.asarray(filt.device_bits)
        step = sharded_step_builder(cfg, filt, mesh)
        t0 = time.monotonic()
        ncx, ncy, masks, checked = step(cx, cy, tx, ty, dpx, dpy, bits)
        jax.block_until_ready(masks)
        compile_s = time.monotonic() - t0
        cx, cy = ncx, ncy       # originals were donated to the step
        t0 = time.monotonic()
        for _ in range(steps):
            cx, cy, masks, checked = step(cx, cy, tx, ty, dpx, dpy, bits)
        jax.block_until_ready((cx, masks))
        dt = (time.monotonic() - t0) / steps
        per_key = dt / cfg.keys_per_step * 1e6
        rows.append((n, dt, per_key))
        print(f"n={n}: {dt * 1e3:8.2f} ms/step  {cfg.keys_per_step:6d} "
              f"keys/step  {per_key:7.3f} us/key  (compile {compile_s:.1f}s)",
              flush=True)
    if len(rows) >= 2:
        base = rows[0][2]
        print("\n# normalized us/key vs n=1 (flat = no sharding overhead):")
        for n, _, pk in rows:
            print(f"n={n}: {pk / base:6.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
