#!/usr/bin/env python3
"""Attribute the mul-step cold-compile time (VERDICT r4 #4).

Compiles the mul step's component sub-graphs SEPARATELY via AOT
(jit(...).lower(...).compile()) against a FRESH compile-cache dir, so
each wall time is a true cold compile of that component:

  scan      - the 18-window gather+incomplete-add lax.scan
  last_add  - the final complete (select-branch) projective add
  inversion - the Pallas batch inversion (+ tiled x/y muls)
  hash33/65 - the fused Pallas hash kernels
  probe     - the device filter probe + mask pack
  full      - the production step graph (everything in one jit)

Usage: python tools/exp_mul_compile.py [batch ...]   (default 2048)
Env: PARTS=scan,last_add,... to select components.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("ABLATE_CACHE", "/tmp/ecloop_ablate_cache")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp
    from ecloop_tpu import ecc, fel, filters, hash160, pallas_kernels
    from ecloop_tpu.search import SearchConfig
    from ecloop_tpu.search.mul import build_gtable, window_indices

    batches = [int(a) for a in sys.argv[1:]] or [2048]
    parts = [p.strip() for p in os.environ.get(
        "PARTS", "scan,last_add,inversion,hash33,hash65,probe,full"
    ).split(",")]

    filt = filters.load_filter(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "btc-bw-hash"))
    cfg = SearchConfig(addr33=True, addr65=True)
    w = 14
    tx, ty = build_gtable(w)
    d = (255 // w) + 1
    bits = jnp.asarray(filt.device_bits)

    def clock(name, f, *args):
        t0 = time.monotonic()
        lowered = jax.jit(f).lower(*args)
        t1 = time.monotonic()
        compiled = lowered.compile()
        t2 = time.monotonic()
        print(f"  {name:10s}: trace {t1 - t0:7.1f}s  compile {t2 - t1:7.1f}s",
              flush=True)
        return compiled

    for batch in batches:
        print(f"batch {batch}:", flush=True)
        bshape = (batch // 1024, 8, 128)
        idx = jnp.asarray(
            window_indices([7 + i for i in range(batch)], w).T)

        def t3(rows):
            return tuple(r.reshape(bshape) for r in rows)

        def make_body(complete):
            def body(carry, idx_i):
                qx, qy, qz = carry
                gx = t3(fel.from_last(jnp.take(tx, jnp.maximum(idx_i, 0),
                                               axis=0)))
                gy = t3(fel.from_last(jnp.take(ty, jnp.maximum(idx_i, 0),
                                               axis=0)))
                nx, ny, nz = ecc.proj_add_affine_rows(qx, qy, qz, gx, gy,
                                                      complete=complete)
                skip = (idx_i < 0).reshape(bshape)
                return (fel.select(skip, qx, nx), fel.select(skip, qy, ny),
                        fel.select(skip, qz, nz)), None
            return body

        zero = fel.const_rows(0, bshape)
        one = fel.const_rows(1, bshape)

        def scan_part(idx):
            carry, _ = jax.lax.scan(make_body(False), (zero, one, zero),
                                    idx[:-1])
            return carry

        def last_part(qx, qy, qz, idx_last):
            (qx, qy, qz), _ = make_body(True)((qx, qy, qz), idx_last)
            return qx, qy, qz

        def inv_part(qx, qy, qz):
            zflat = tuple(r.reshape(-1) for r in qz)
            zinv = t3(pallas_kernels.inv_mod_batch_pallas(zflat))
            return fel.mul_mod(qx, zinv), fel.mul_mod(qy, zinv)

        def probe_part(h):
            from ecloop_tpu.search.add import _pack_mask
            return _pack_mask(filt.device_probe(list(h)))

        q = (t3(fel.from_last(jnp.take(tx, idx[0] % 100, axis=0))),
             t3(fel.from_last(jnp.take(ty, idx[0] % 100, axis=0))),
             one)
        h5 = tuple(jnp.zeros(bshape, jnp.uint32) for _ in range(5))

        if "scan" in parts:
            clock("scan", scan_part, idx)
        if "last_add" in parts:
            clock("last_add", last_part, *q, idx[-1])
        if "inversion" in parts:
            clock("inversion", inv_part, *q)
        if "hash33" in parts:
            clock("hash33", pallas_kernels.addr33_hash_rows_pallas,
                  q[0], q[1])
        if "hash65" in parts:
            clock("hash65", pallas_kernels.addr65_hash_rows_pallas,
                  q[0], q[1])
        if "probe" in parts:
            clock("probe", probe_part, h5)
        if "full" in parts:
            from ecloop_tpu.search.mul import make_mul_step
            step = make_mul_step(cfg, filt, w, batch)
            clock("full", step, idx, tx, ty, bits)


if __name__ == "__main__":
    main()
