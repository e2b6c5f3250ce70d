"""Limb-first field layer (fel.py) vs golden model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecloop_tpu import fe, fel, golden

P = golden.P


def rows_of(vals):
    return fel.from_last(jnp.asarray(fe.ints_to_limbs(vals)))


def ints_of(rows):
    return fe.limbs_to_ints(np.asarray(fel.to_last(rows)))


@pytest.fixture
def vals(rng):
    edge = [0, 1, 2, P - 1, P - 2, (1 << 256) % P, 0xFFFF, 1 << 255]
    return edge + [rng.randrange(P) for _ in range(56)]


def test_add_sub_neg(vals, rng):
    b = [rng.randrange(P) for _ in vals]
    ra, rb = rows_of(vals), rows_of(b)
    assert ints_of(jax.jit(fel.add_mod)(ra, rb)) == [
        (x + y) % P for x, y in zip(vals, b)]
    assert ints_of(jax.jit(fel.sub_mod)(ra, rb)) == [
        (x - y) % P for x, y in zip(vals, b)]
    assert ints_of(jax.jit(fel.neg_mod)(ra)) == [(-x) % P for x in vals]


def test_mul_sqr(vals, rng):
    b = [rng.randrange(P) for _ in vals]
    ra, rb = rows_of(vals), rows_of(b)
    assert ints_of(jax.jit(fel.mul_mod)(ra, rb)) == [
        x * y % P for x, y in zip(vals, b)]
    assert ints_of(jax.jit(fel.sqr_mod)(ra)) == [x * x % P for x in vals]
    for k in (2, 3, 7, 8):
        got = ints_of(jax.jit(lambda r, k=k: fel.mul_small(r, k))(ra))
        assert got == [x * k % P for x in vals]


def test_mul_by_scalar_consts(vals):
    ra = rows_of(vals)
    beta = fel.const_rows(golden.BETA1)
    got = ints_of(jax.jit(lambda r: fel.mul_mod(r, beta))(ra))
    assert got == [x * golden.BETA1 % P for x in vals]


def test_inv_and_batch(vals):
    nz = [v if v else 5 for v in vals]
    ra = rows_of(nz)
    assert ints_of(jax.jit(fel.inv_mod)(ra)) == [
        pow(x, P - 2, P) for x in nz]

    withz = list(nz)
    withz[3] = 0
    rz = rows_of(withz)
    got = ints_of(jax.jit(lambda r: fel.inv_mod_batch(r, lanes=16))(rz))
    want = [pow(x, P - 2, P) if x else 0 for x in withz]
    assert got == want


def test_native_forms_parity(vals, monkeypatch, rng):
    """The unrolled TPU forms (diagonal mul_wide, dedicated sqr, carry
    sweeps) vs golden, force-enabled on a small batch so the CPU suite
    still exercises them (the CPU default routes heavy fel ops through
    fe — see fel._native_forms)."""
    monkeypatch.setenv("ECLOOP_FEL_NATIVE", "1")
    small = vals[:16]
    b = [rng.randrange(1, P) for _ in small]
    ra, rb = rows_of(small), rows_of(b)
    assert ints_of(jax.jit(fel.mul_mod)(ra, rb)) == [
        x * y % P for x, y in zip(small, b)]
    assert ints_of(jax.jit(fel.sqr_mod)(ra)) == [x * x % P for x in small]
    assert ints_of(jax.jit(lambda r: fel.mul_small(r, 8))(ra)) == [
        x * 8 % P for x in small]
    # the native inversion chain (fori-of-sqr bodies) is a pathological
    # XLA:CPU compile — covered on the TPU backend by test_tpu_variants


def test_predicates(vals):
    ra = rows_of(vals)
    z = np.asarray(fel.is_zero(ra))
    assert z.tolist() == [v == 0 for v in vals]
    assert bool(np.all(np.asarray(fel.eq(ra, ra))))


def test_hash_rows_matches_array_api(rng):
    from ecloop_tpu import hash160
    ks = [rng.randrange(1, golden.N) for _ in range(8)]
    pts = [golden.point_mul(k) for k in ks]
    x = jnp.asarray(fe.ints_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(fe.ints_to_limbs([p[1] for p in pts]))
    xr, yr = fel.from_last(x), fel.from_last(y)
    h33 = np.stack([np.asarray(r) for r in
                    jax.jit(hash160.addr33_hash_rows)(xr, yr)], axis=-1)
    h65 = np.stack([np.asarray(r) for r in
                    jax.jit(hash160.addr65_hash_rows)(xr, yr)], axis=-1)
    for i, p in enumerate(pts):
        assert hash160.h160_to_hex(h33[i])[0] == golden.addr33(p).hex()
        assert hash160.h160_to_hex(h65[i])[0] == golden.addr65(p).hex()
