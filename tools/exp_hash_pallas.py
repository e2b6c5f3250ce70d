#!/usr/bin/env python3
"""Correctness + throughput of the fused Pallas hash160 kernel vs the
XLA-fused jnp pipeline, at the production tiling."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecloop_tpu import fe, fel, golden, hash160, pallas_kernels

    jax.config.update("jax_compilation_cache_dir", "/tmp/ecloop_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    B = int(os.environ.get("B", 131072))
    IT = int(os.environ.get("IT", 30))
    pts = [golden.point_mul(k) for k in range(2, 258)]
    px = np.tile(fe.ints_to_limbs([p[0] for p in pts]), (B // 256, 1))
    py = np.tile(fe.ints_to_limbs([p[1] for p in pts]), (B // 256, 1))
    xr = tuple(r.reshape(-1, 8, 128)
               for r in fel.from_last(jnp.asarray(px)))
    yr = tuple(r.reshape(-1, 8, 128)
               for r in fel.from_last(jnp.asarray(py)))

    # --- correctness: pallas vs xla, both variants ----------------------
    for is33 in (True, False):
        ref_fn = (hash160.addr33_hash_rows if is33
                  else hash160.addr65_hash_rows)
        pl_fn = (pallas_kernels.addr33_hash_rows_pallas if is33
                 else pallas_kernels.addr65_hash_rows_pallas)
        href = jax.jit(lambda a, b: ref_fn(a, b))(xr, yr)
        hpl = jax.jit(lambda a, b: pl_fn(a, b))(xr, yr)
        for i in range(5):
            np.testing.assert_array_equal(np.asarray(href[i]),
                                          np.asarray(hpl[i]))
        print(f"addr{'33' if is33 else '65'}: pallas == xla "
              f"({B} elems)", flush=True)

    # --- throughput -----------------------------------------------------
    def timed(label, fn):
        @jax.jit
        def chain(args):
            x, y = args
            h = fn(x, y)
            x = tuple(r ^ (h[0] & 1) for r in x)
            return (x, y)
        x = (xr, yr)
        y = chain(x)
        np.asarray(y[0][0][..., :1])
        t0 = time.time()
        for _ in range(IT):
            x = chain(x)
        np.asarray(x[0][0][..., :1])
        per = (time.time() - t0) / IT
        print(f"{label:34s}: {per * 1e3:8.3f} ms  "
              f"{B / per / 1e6:9.1f} Melem/s", flush=True)

    timed("addr33 XLA", hash160.addr33_hash_rows)
    timed("addr33 PALLAS", pallas_kernels.addr33_hash_rows_pallas)
    timed("addr65 XLA", hash160.addr65_hash_rows)
    timed("addr65 PALLAS", pallas_kernels.addr65_hash_rows_pallas)


if __name__ == "__main__":
    main()
