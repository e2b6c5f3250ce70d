"""Field-arithmetic kernels vs the Python-int golden model."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecloop_tpu import fe, golden

P = golden.P

# jit everything once per shape — eager per-op dispatch is too slow for the
# long op chains (inv is ~270 modmuls).
j_add = jax.jit(fe.add_mod)
j_sub = jax.jit(fe.sub_mod)
j_neg = jax.jit(fe.neg_mod)
j_mul_wide = jax.jit(fe.mul_wide)
j_mul = jax.jit(fe.mul_mod_p)
j_sqr = jax.jit(fe.sqr_mod_p)
j_inv = jax.jit(fe.inv_mod_p)
j_inv_batch = jax.jit(fe.inv_mod_p_batch, static_argnames="lanes")
j_mul_small = jax.jit(fe.mul_mod_p_small, static_argnames="k")


def rand_elems(rng, n, bound=P):
    return [rng.randrange(bound) for _ in range(n)]


def to_dev(xs):
    return jnp.asarray(fe.ints_to_limbs(xs))


def test_limb_roundtrip(rng):
    xs = rand_elems(rng, 50, 2**256)
    assert fe.limbs_to_ints(fe.ints_to_limbs(xs)) == xs


def test_add_sub_neg(rng):
    xs = rand_elems(rng, 256) + [0, 1, P - 1]
    ys = rand_elems(rng, 256) + [0, P - 1, P - 1]
    a, b = to_dev(xs), to_dev(ys)
    assert fe.limbs_to_ints(j_add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert fe.limbs_to_ints(j_sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert fe.limbs_to_ints(j_neg(a)) == [(-x) % P for x in xs]


def test_mod_n_variant(rng):
    n = golden.N
    xs = rand_elems(rng, 64, n) + [0, n - 1]
    ys = rand_elems(rng, 64, n) + [n - 1, n - 1]
    a, b = to_dev(xs), to_dev(ys)
    nl = jnp.asarray(fe.N_LIMBS)
    assert fe.limbs_to_ints(j_add(a, b, nl)) == [(x + y) % n for x, y in zip(xs, ys)]
    assert fe.limbs_to_ints(j_sub(a, b, nl)) == [(x - y) % n for x, y in zip(xs, ys)]


def test_mul_wide(rng):
    xs = rand_elems(rng, 128, 2**256) + [2**256 - 1, 0, 1]
    ys = rand_elems(rng, 128, 2**256) + [2**256 - 1, 1, 0]
    r = j_mul_wide(to_dev(xs), to_dev(ys))
    assert fe.limbs_to_ints(r) == [x * y for x, y in zip(xs, ys)]


def test_mul_mod_p(rng):
    xs = rand_elems(rng, 256) + [P - 1, P - 1, 0, 1]
    ys = rand_elems(rng, 256) + [P - 1, 1, 5, P - 1]
    r = j_mul(to_dev(xs), to_dev(ys))
    assert fe.limbs_to_ints(r) == [x * y % P for x, y in zip(xs, ys)]
    r = j_sqr(to_dev(xs))
    assert fe.limbs_to_ints(r) == [x * x % P for x in xs]


def test_mul_mod_small(rng):
    xs = rand_elems(rng, 64) + [P - 1, 0]
    for k in (2, 3, 7, 8, 0x3D1):
        r = j_mul_small(to_dev(xs), k=k)
        assert fe.limbs_to_ints(r) == [x * k % P for x in xs]


def test_inv_chain_exponent():
    """Prove the addition chain in inv_mod_p computes a^(p-2)."""
    assert fe._chain_exponent() == P - 2


def test_inv_mod_p(rng):
    xs = rand_elems(rng, 32) + [1, 2, P - 1]
    xs = [x for x in xs if x]
    r = j_inv(to_dev(xs))
    assert fe.limbs_to_ints(r) == [pow(x, P - 2, P) for x in xs]


@pytest.mark.parametrize("b,lanes", [(8, 4), (64, 16), (128, 128), (96, 1024)])
def test_inv_batch(rng, b, lanes):
    xs = [x for x in rand_elems(rng, b)]
    xs[3] = 0  # zero passthrough
    r = j_inv_batch(to_dev(xs), lanes=lanes)
    want = [pow(x, P - 2, P) if x else 0 for x in xs]
    assert fe.limbs_to_ints(r) == want


def test_inv_batch_2d(rng):
    xs = rand_elems(rng, 24)
    r = j_inv_batch(to_dev(xs).reshape(2, 3, 4, 16), lanes=4)
    assert fe.limbs_to_ints(r) == [pow(x, P - 2, P) for x in xs]


def test_geq_eq_iszero(rng):
    xs = rand_elems(rng, 64)
    ys = list(xs[:32]) + rand_elems(rng, 32)
    a, b = to_dev(xs), to_dev(ys)
    np.testing.assert_array_equal(np.asarray(fe.geq(a, b)),
                                  [x >= y for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(np.asarray(fe.eq(a, b)),
                                  [x == y for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(np.asarray(fe.is_zero(to_dev([0, 1, P]))),
                                  [True, False, False])


def test_jit_and_grad_free(rng):
    """ops are jittable and stable under jit."""
    xs, ys = rand_elems(rng, 16), rand_elems(rng, 16)
    f = jax.jit(lambda a, b: fe.mul_mod_p(j_add(a, b), fe.inv_mod_p(b)))
    r = f(to_dev(xs), to_dev(ys))
    want = [(x + y) % P * pow(y, P - 2, P) % P for x, y in zip(xs, ys)]
    assert fe.limbs_to_ints(r) == want
