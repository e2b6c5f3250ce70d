"""Parity tests for the TPU-variant (unrolled / diagonal-form) kernels.

The production TPU path uses graph forms that are pathological for
XLA:CPU *compile time* (fully unrolled hash rounds, diagonal-sum
mul_wide, dedicated squaring, unrolled inversion scans), so the default
CPU suite exercises the scan/padded forms.  This module force-enables
the TPU forms on small shapes and checks bit-exactness against the
golden model — it runs when ECLOOP_RUN_SLOW=1 (several minutes of CPU
compile) or automatically when a TPU backend is present.
"""

import os
import random

import numpy as np
import pytest

import jax

_on_tpu = False
try:
    _on_tpu = jax.default_backend() != "cpu"
except Exception:
    pass

pytestmark = pytest.mark.skipif(
    not (_on_tpu or os.environ.get("ECLOOP_RUN_SLOW") == "1"),
    reason="TPU-variant graphs are slow to compile on CPU; "
           "set ECLOOP_RUN_SLOW=1")


@pytest.fixture(autouse=True)
def _force_variant_flags(monkeypatch):
    # one global switch (ecloop_tpu.policy): unrolled fe/hash AND native
    # fel rows — the forms production executes on TPU
    monkeypatch.setenv("ECLOOP_TPU_FORMS", "1")


def test_mul_sqr_inv_variant_parity(rng):
    import jax.numpy as jnp
    from ecloop_tpu import fe, golden

    vals = [rng.randrange(golden.P) for _ in range(64)]
    a = jnp.asarray(fe.ints_to_limbs(vals))
    b = jnp.asarray(fe.ints_to_limbs(list(reversed(vals))))

    got = fe.limbs_to_ints(np.asarray(jax.jit(fe.mul_mod_p)(a, b)))
    want = [x * y % golden.P for x, y in zip(vals, reversed(vals))]
    assert got == want

    got = fe.limbs_to_ints(np.asarray(jax.jit(fe.sqr_mod_p)(a)))
    assert got == [x * x % golden.P for x in vals]

    got = fe.limbs_to_ints(np.asarray(jax.jit(fe.inv_mod_p)(a)))
    assert got == [pow(x, golden.P - 2, golden.P) for x in vals]

    batched = jax.jit(lambda x: fe.inv_mod_p_batch(x, lanes=16))
    got = fe.limbs_to_ints(np.asarray(batched(a)))
    assert got == [pow(x, golden.P - 2, golden.P) for x in vals]


def test_hash_variant_parity(rng):
    import jax.numpy as jnp
    from ecloop_tpu import fe, golden, hash160

    ks = [rng.randrange(1, golden.N) for _ in range(8)]
    pts = [golden.point_mul(k) for k in ks]
    x = jnp.asarray(fe.ints_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(fe.ints_to_limbs([p[1] for p in pts]))
    h33 = np.asarray(jax.jit(hash160.addr33_hash)(x, y))
    h65 = np.asarray(jax.jit(hash160.addr65_hash)(x, y))
    for i, p in enumerate(pts):
        assert hash160.h160_to_hex(h33[i])[0] == golden.addr33(p).hex()
        assert hash160.h160_to_hex(h65[i])[0] == golden.addr65(p).hex()


@pytest.mark.skipif(not _on_tpu, reason="Pallas kernels need Mosaic/TPU")
def _pallas_ctx():
    """Pallas kernels compile via Mosaic only on TPU; on a CPU run
    (ECLOOP_RUN_SLOW) execute them through the TPU interpreter."""
    import contextlib
    from jax.experimental.pallas import tpu as pltpu
    if _on_tpu:
        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def test_pallas_hash_parity(rng):
    """Fused Pallas hash160 kernel vs golden, at one full tile batch."""
    import jax.numpy as jnp
    from ecloop_tpu import fe, fel, golden, hash160, pallas_kernels

    ks = [rng.randrange(1, golden.N) for _ in range(64)] * 16
    pts = [golden.point_mul(k) for k in ks]
    x = tuple(r.reshape(-1, 8, 128) for r in fel.from_last(
        jnp.asarray(fe.ints_to_limbs([p[0] for p in pts]))))
    y = tuple(r.reshape(-1, 8, 128) for r in fel.from_last(
        jnp.asarray(fe.ints_to_limbs([p[1] for p in pts]))))
    with _pallas_ctx():
        h33 = [np.asarray(r).reshape(-1) for r in
               jax.jit(pallas_kernels.addr33_hash_rows_pallas)(x, y)]
        h65 = [np.asarray(r).reshape(-1) for r in
               jax.jit(pallas_kernels.addr65_hash_rows_pallas)(x, y)]
    for i in (0, 1, 63, 64, 1023):
        got33 = "".join(f"{h[i]:08x}" for h in h33)
        got65 = "".join(f"{h[i]:08x}" for h in h65)
        assert got33 == golden.addr33(pts[i]).hex()
        assert got65 == golden.addr65(pts[i]).hex()


def test_pallas_mixed_add_parity(rng, monkeypatch):
    """Fused Pallas gtable-window add (incomplete + complete forms) vs
    the golden model, including skip passthrough, infinity accumulator
    and (complete form) the P == Q doubling branch."""
    if not _on_tpu:
        # the TPU interpreter executes the kernel op-by-op; with the
        # unrolled native fel forms one complete-add call runs >20 min
        # on a CPU core — interpret through the compact forms instead
        # (same kernel structure, fe-layer math already CPU-tested)
        monkeypatch.setenv("ECLOOP_FEL_NATIVE", "0")
    import jax.numpy as jnp
    from ecloop_tpu import fe, fel, golden, pallas_kernels

    B = 1024
    qk = [rng.randrange(1, golden.N) for _ in range(B)]
    gk = [rng.randrange(1, golden.N) for _ in range(B)]
    qk[0] = 0                     # infinity accumulator lane
    gk[1] = qk[1]                 # P == Q lane (complete form doubles)
    skip_lanes = {2, 700}
    qp = [golden.point_mul(k) if k else (0, 0) for k in qk]
    gp = [golden.point_mul(k) for k in gk]

    def rows(vals):
        return tuple(r.reshape(-1, 8, 128) for r in fel.from_last(
            jnp.asarray(fe.ints_to_limbs(vals))))

    qx = rows([p[0] for p in qp])
    qy = rows([p[1] for p in qp])
    qz = rows([1 if k else 0 for k in qk])
    gx = rows([p[0] for p in gp])
    gy = rows([p[1] for p in gp])
    skip = jnp.asarray(
        np.array([1 if i in skip_lanes else 0 for i in range(B)],
                 dtype=np.uint32)).reshape(-1, 8, 128)

    for complete in (True, False):
        if not complete:
            gk[1] = (qk[1] + 7) % golden.N      # avoid the dbl lane
            gp[1] = golden.point_mul(gk[1])
            gx = rows([p[0] for p in gp])
            gy = rows([p[1] for p in gp])
        with _pallas_ctx():
            nx, ny, nz = jax.jit(
                lambda a, b, c, d, e, s, _c=complete:
                pallas_kernels.proj_add_affine_pallas(a, b, c, d, e, s, _c)
            )(qx, qy, qz, gx, gy, skip)
        # reduce each lane to affine on host ints and compare
        xs = fe.limbs_to_ints(np.stack([np.asarray(r).reshape(-1)
                                        for r in nx], axis=-1))
        ys = fe.limbs_to_ints(np.stack([np.asarray(r).reshape(-1)
                                        for r in ny], axis=-1))
        zs = fe.limbs_to_ints(np.stack([np.asarray(r).reshape(-1)
                                        for r in nz], axis=-1))
        for i in (0, 1, 2, 3, 700, 701, 1023):
            if i in skip_lanes:
                want = qp[i]
            else:
                want = golden.point_add(qp[i] if qk[i] else None, gp[i])
            zi = zs[i]
            if zi == 0:
                assert want is None or want == (0, 0)
                continue
            zinv = pow(zi, -1, golden.P)
            got = (xs[i] * zinv % golden.P, ys[i] * zinv % golden.P)
            assert got == want, f"lane {i} complete={complete}"
