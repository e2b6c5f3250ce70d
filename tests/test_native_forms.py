"""Bit-exact parity of the TPU-production LEAF kernel forms on CPU.

The production device path runs the fully-unrolled fel limb-row forms
and the unrolled hash rounds (fel._native_forms / hash160._unroll
gating); the default CPU suite exercises the scan/padded forms, so
without this module the graphs the TPU actually executes run nowhere
in CI (VERDICT r2 #5).  Here the native forms are FORCED on tiny
shapes and leaf kernels only — whole-step graphs in native form are
the known XLA:CPU compile pathology, leaf kernels compile in seconds
to a couple of minutes.
"""

import os
import random

import numpy as np
import pytest
import jax

P = None  # filled on import below


@pytest.fixture(autouse=True)
def _force_native(monkeypatch):
    monkeypatch.setenv("ECLOOP_FEL_NATIVE", "1")
    monkeypatch.setenv("ECLOOP_HASH_UNROLL", "1")


def _rows_of(vals):
    import jax.numpy as jnp
    from ecloop_tpu import fe, fel
    return fel.from_last(jnp.asarray(fe.ints_to_limbs(vals)))


def _ints_of(rows):
    from ecloop_tpu import fe, fel
    return fe.limbs_to_ints(np.asarray(fel.to_last(tuple(rows))))


def test_fel_native_mul_sqr_add_sub(rng):
    from ecloop_tpu import fel, golden

    p = golden.P
    vals_a = [rng.randrange(p) for _ in range(8)] + [0, 1, p - 1]
    vals_b = [rng.randrange(p) for _ in range(8)] + [p - 1, p - 1, 1]
    a, b = _rows_of(vals_a), _rows_of(vals_b)

    assert _ints_of(fel.mul_mod(a, b)) == [
        x * y % p for x, y in zip(vals_a, vals_b)]
    assert _ints_of(fel.sqr_mod(a)) == [x * x % p for x in vals_a]
    assert _ints_of(fel.add_mod(a, b)) == [
        (x + y) % p for x, y in zip(vals_a, vals_b)]
    assert _ints_of(fel.sub_mod(a, b)) == [
        (x - y) % p for x, y in zip(vals_a, vals_b)]
    assert _ints_of(fel.neg_mod(a)) == [(-x) % p for x in vals_a]


def test_fel_native_inverse(rng):
    from ecloop_tpu import fel, golden

    p = golden.P
    vals = [rng.randrange(1, p) for _ in range(8)]
    a = _rows_of(vals)
    assert _ints_of(fel.inv_mod(a)) == [pow(x, p - 2, p) for x in vals]
    got = _ints_of(fel.inv_mod_batch(a, lanes=4))
    assert got == [pow(x, p - 2, p) for x in vals]


def test_hash_native_rows_parity(rng):
    from ecloop_tpu import golden, hash160

    ks = [rng.randrange(1, golden.N) for _ in range(8)]
    pts = [golden.point_mul(k) for k in ks]
    x = _rows_of([p[0] for p in pts])
    y = _rows_of([p[1] for p in pts])
    h33 = [np.asarray(r) for r in hash160.addr33_hash_rows(x, y)]
    h65 = [np.asarray(r) for r in hash160.addr65_hash_rows(x, y)]
    for i, p in enumerate(pts):
        got33 = "".join(f"{h[i]:08x}" for h in h33)
        got65 = "".join(f"{h[i]:08x}" for h in h65)
        assert got33 == golden.addr33(p).hex()
        assert got65 == golden.addr65(p).hex()


def test_native_chord_add(rng):
    from ecloop_tpu import ecc, fel, golden

    ks = [rng.randrange(1, golden.N) for _ in range(8)]
    pts = [golden.point_mul(k) for k in ks]
    qts = [golden.point_mul(k + 7) for k in ks]
    px, py = _rows_of([p[0] for p in pts]), _rows_of([p[1] for p in pts])
    qx, qy = _rows_of([q[0] for q in qts]), _rows_of([q[1] for q in qts])
    inv_dx = fel.inv_mod(fel.sub_mod(qx, px))
    rx, ry = ecc.affine_add_rows(px, py, qx, qy, inv_dx)
    want = [golden.point_add(p, q) for p, q in zip(pts, qts)]
    assert _ints_of(rx) == [w[0] for w in want]
    assert _ints_of(ry) == [w[1] for w in want]
