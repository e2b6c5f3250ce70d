"""Point-arithmetic kernels vs the golden model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecloop_tpu import ecc, fe, golden

P = golden.P

j_batch_add = jax.jit(ecc.batch_affine_add, static_argnames="lanes")
j_proj_add = jax.jit(ecc.proj_add)
j_proj_add_affine = jax.jit(ecc.proj_add_affine)
j_proj_dbl = jax.jit(ecc.proj_dbl)
j_to_affine = jax.jit(ecc.proj_to_affine, static_argnames="lanes")
j_scalar_mul = jax.jit(ecc.scalar_mul)
j_on_curve = jax.jit(ecc.on_curve)


def rand_points(rng, n):
    ks = [rng.randrange(1, golden.N) for _ in range(n)]
    return ks, [golden.point_mul(k) for k in ks]


def test_batch_affine_add(rng):
    ks, pts = rand_points(rng, 32)
    ls, qts = rand_points(rng, 32)
    px, py = ecc.ints_to_pts(pts)
    qx, qy = ecc.ints_to_pts(qts)
    rx, ry = j_batch_add(px, py, qx, qy, lanes=8)
    want = [golden.point_add(p, q) for p, q in zip(pts, qts)]
    assert ecc.pts_to_ints(rx, ry) == want


def test_proj_add_and_dbl(rng):
    ks, pts = rand_points(rng, 16)
    ls, qts = rand_points(rng, 16)
    px, py = ecc.ints_to_pts(pts)
    qx, qy = ecc.ints_to_pts(qts)
    x1, y1, z1 = ecc.proj_from_affine(px, py)
    x2, y2, z2 = ecc.proj_from_affine(qx, qy)
    x3, y3, z3 = j_proj_add(x1, y1, z1, x2, y2, z2)
    ax, ay = j_to_affine(x3, y3, z3, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_add(p, q)
                                       for p, q in zip(pts, qts)]
    # doubling
    x3, y3, z3 = j_proj_dbl(x1, y1, z1)
    ax, ay = j_to_affine(x3, y3, z3, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_dbl(p) for p in pts]


def test_proj_add_degenerate_cases(rng):
    """P==Q -> dbl; P==-Q -> inf; P=inf, Q=inf handled."""
    k, pt = rand_points(rng, 1)
    px, py = ecc.ints_to_pts([pt[0], pt[0], pt[0], (0, 0)])
    qx, qy = ecc.ints_to_pts([pt[0], golden.point_neg(pt[0]), (0, 0), pt[0]])
    x1, y1, z1 = ecc.proj_from_affine(px, py)
    x2, y2, z2 = ecc.proj_from_affine(qx, qy)
    # mark index 2's Q and index 3's P as infinity via z=0
    z2 = z2.at[2].set(0)
    z1 = z1.at[3].set(0)
    x3, y3, z3 = j_proj_add(x1, y1, z1, x2, y2, z2)
    # [0] doubling
    ax, ay = j_to_affine(x3, y3, z3, lanes=4)
    got = ecc.pts_to_ints(ax, ay)
    assert got[0] == golden.point_dbl(pt[0])
    # [1] P + (-P) = infinity -> z == 0
    assert bool(fe.is_zero(z3[1]))
    # [2] P + inf = P, [3] inf + Q = Q
    assert got[2] == pt[0]
    assert got[3] == pt[0]


def test_proj_add_affine_matches(rng):
    ks, pts = rand_points(rng, 8)
    ls, qts = rand_points(rng, 8)
    px, py = ecc.ints_to_pts(pts)
    qx, qy = ecc.ints_to_pts(qts)
    x1, y1, z1 = ecc.proj_from_affine(px, py)
    # make z non-trivial by doubling first
    x1, y1, z1 = j_proj_dbl(x1, y1, z1)
    x3, y3, z3 = j_proj_add_affine(x1, y1, z1, qx, qy)
    ax, ay = j_to_affine(x3, y3, z3, lanes=4)
    want = [golden.point_add(golden.point_dbl(p), q)
            for p, q in zip(pts, qts)]
    assert ecc.pts_to_ints(ax, ay) == want


def test_scalar_mul(rng):
    ks = [1, 2, 3, 0xC936, rng.randrange(golden.N), golden.N - 1,
          rng.randrange(golden.N), rng.randrange(2**255, golden.N)]
    kl = jnp.asarray(fe.ints_to_limbs(ks))
    x, y, z = j_scalar_mul(kl)
    ax, ay = j_to_affine(x, y, z, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_mul(k) for k in ks]


def test_scalar_mul_arbitrary_base(rng):
    base_k = rng.randrange(golden.N)
    base = golden.point_mul(base_k)
    ks = [rng.randrange(golden.N) for _ in range(4)]
    kl = jnp.asarray(fe.ints_to_limbs(ks))
    bx = jnp.broadcast_to(jnp.asarray(fe.int_to_limbs(base[0])), kl.shape)
    by = jnp.broadcast_to(jnp.asarray(fe.int_to_limbs(base[1])), kl.shape)
    x, y, z = j_scalar_mul(kl, bx, by)
    ax, ay = j_to_affine(x, y, z, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_mul(k, base) for k in ks]


def test_on_curve(rng):
    ks, pts = rand_points(rng, 8)
    px, py = ecc.ints_to_pts(pts)
    assert bool(jnp.all(j_on_curve(px, py)))
    assert not bool(jnp.any(j_on_curve(px, fe.add_mod(py, py))))


# --- jacobian v2 coordinate system (lib/ecc.c:711-806 counterpart) -----------

j_jac_add = jax.jit(ecc.jac_add)
j_jac_dbl = jax.jit(ecc.jac_dbl)
j_jac_to_affine = jax.jit(ecc.jac_to_affine, static_argnames="lanes")


def test_jac_add_and_dbl(rng):
    ks, pts = rand_points(rng, 16)
    ls, qts = rand_points(rng, 16)
    px, py = ecc.ints_to_pts(pts)
    qx, qy = ecc.ints_to_pts(qts)
    x1, y1, z1 = ecc.jac_from_affine(px, py)
    x2, y2, z2 = ecc.jac_from_affine(qx, qy)
    x3, y3, z3 = j_jac_add(x1, y1, z1, x2, y2, z2)
    ax, ay = j_jac_to_affine(x3, y3, z3, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_add(p, q)
                                       for p, q in zip(pts, qts)]
    x3, y3, z3 = j_jac_dbl(x1, y1, z1)
    ax, ay = j_jac_to_affine(x3, y3, z3, lanes=4)
    assert ecc.pts_to_ints(ax, ay) == [golden.point_dbl(p) for p in pts]


def test_jac_add_degenerate_cases(rng):
    """P==Q -> dbl; P==-Q -> inf; P=inf, Q=inf handled (the reference's
    v2 asserts on these, ecc.c:759; here they must flow through)."""
    k, pt = rand_points(rng, 1)
    px, py = ecc.ints_to_pts([pt[0], pt[0], pt[0], (0, 0)])
    qx, qy = ecc.ints_to_pts([pt[0], golden.point_neg(pt[0]), (0, 0), pt[0]])
    x1, y1, z1 = ecc.jac_from_affine(px, py)
    x2, y2, z2 = ecc.jac_from_affine(qx, qy)
    z2 = z2.at[2].set(0)
    z1 = z1.at[3].set(0)
    x3, y3, z3 = j_jac_add(x1, y1, z1, x2, y2, z2)
    ax, ay = j_jac_to_affine(x3, y3, z3, lanes=4)
    got = ecc.pts_to_ints(ax, ay)
    assert got[0] == golden.point_dbl(pt[0])
    assert bool(fe.is_zero(z3[1]))
    assert got[2] == pt[0]
    assert got[3] == pt[0]


def test_jac_chain_matches_projective(rng):
    """Independent cross-check of the two coordinate systems against each
    other (the reference's mult_verify idea applied to point ops): a mixed
    add/dbl chain computed in both must land on the same affine points."""
    ks, pts = rand_points(rng, 8)
    px, py = ecc.ints_to_pts(pts)
    jx, jy, jz = ecc.jac_from_affine(px, py)
    vx, vy, vz = ecc.proj_from_affine(px, py)
    for _ in range(3):
        jx, jy, jz = j_jac_add(*j_jac_dbl(jx, jy, jz),
                               *ecc.jac_from_affine(px, py))
        vx, vy, vz = j_proj_add(*j_proj_dbl(vx, vy, vz),
                                *ecc.proj_from_affine(px, py))
    ja = ecc.pts_to_ints(*j_jac_to_affine(jx, jy, jz, lanes=4))
    va = ecc.pts_to_ints(*j_to_affine(vx, vy, vz, lanes=4))
    assert ja == va
    assert bool(jnp.all(j_on_curve(*j_jac_to_affine(jx, jy, jz, lanes=4))))
