"""secp256k1 point arithmetic, batched for TPU.

Points are (x, y[, z]) tuples of limb arrays (..., 16) from `fe`.  Two
coordinate systems:

  * **affine** — the hot `add`-mode representation: batch chord addition
    with Montgomery group inversion (the reference's load-bearing trick,
    /root/reference/main.c:349-403 + lib/ecc.c:522-540, re-architected so
    the batch dimension is TPU vector lanes instead of a C loop).
  * **homogeneous projective** — for scalar multiplication and gtable
    accumulation where per-step inversion is unaffordable
    (counterpart of the reference's `_ec_jacobi_*1` ops, lib/ecc.c:611-707;
    formulas here are the standard complete-enough projective ones,
    written fresh with select-based infinity handling instead of asserts).

Infinity is represented by z == 0 (projective) or an explicit validity
mask (affine batches), never by in-band sentinels.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fe, fel, golden


# --- limb-first (rows) chord ops (production step path) ----------------------

def affine_add_rows(px, py, qx, qy, inv_dx):
    """Chord addition on fel row tuples with precomputed 1/(qx - px)."""
    lam = fel.mul_mod(fel.sub_mod(qy, py), inv_dx)
    rx = fel.sub_mod(fel.sub_mod(fel.sqr_mod(lam), px), qx)
    ry = fel.sub_mod(fel.mul_mod(lam, fel.sub_mod(px, rx)), py)
    return rx, ry


def proj_dbl_rows(x1, y1, z1):
    """Projective doubling on fel rows (a = 0 curve)."""
    w = fel.mul_small(fel.sqr_mod(x1), 3)
    s = fel.mul_mod(y1, z1)
    b = fel.mul_mod(fel.mul_mod(x1, y1), s)
    h = fel.sub_mod(fel.sqr_mod(w), fel.mul_small(b, 8))
    x3 = fel.mul_mod(fel.mul_small(h, 2), s)
    y3 = fel.sub_mod(
        fel.mul_mod(w, fel.sub_mod(fel.mul_small(b, 4), h)),
        fel.mul_small(fel.sqr_mod(fel.mul_mod(y1, s)), 8))
    z3 = fel.mul_small(fel.mul_mod(fel.sqr_mod(s), s), 8)
    return x3, y3, z3


def proj_add_affine_rows(x1, y1, z1, x2, y2, complete: bool = True):
    """Mixed projective+affine addition on fel rows.

    complete=True: P = inf, P == Q, P == -Q all handled via selects.
    complete=False drops the P == Q doubling branch (~45% of the math):
    P = inf and P == -Q (result = infinity) still work.  Callers may use
    it when P == Q is impossible — e.g. the gtable window scan, where
    the accumulator after the first i windows is (k mod 2^(w*i))*G with
    k mod 2^(w*i) < 2^(w*i), while the incoming table point is
    digit*2^(w*i)*G with digit >= 1, so their scalars can never match
    (nor sum to n) until the top window wraps mod n."""
    u1 = fel.mul_mod(y2, z1)
    v1 = fel.mul_mod(x2, z1)
    u = fel.sub_mod(u1, y1)
    v = fel.sub_mod(v1, x1)

    p_inf = fel.is_zero(z1)

    vsq = fel.sqr_mod(v)
    vcu = fel.mul_mod(vsq, v)
    a = fel.sub_mod(
        fel.sub_mod(fel.mul_mod(fel.sqr_mod(u), z1), vcu),
        fel.mul_small(fel.mul_mod(vsq, x1), 2))
    x3 = fel.mul_mod(v, a)
    y3 = fel.sub_mod(
        fel.mul_mod(u, fel.sub_mod(fel.mul_mod(vsq, x1), a)),
        fel.mul_mod(vcu, y1))
    z3 = fel.mul_mod(vcu, z1)

    if complete:
        same_x = fel.is_zero(v)
        same_y = fel.is_zero(u)
        dx_, dy_, dz_ = proj_dbl_rows(x1, y1, z1)
        is_dbl = same_x & same_y & ~p_inf
        x3 = fel.select(is_dbl, dx_, x3)
        y3 = fel.select(is_dbl, dy_, y3)
        z3 = fel.select(is_dbl, dz_, z3)

    one = fel.const_rows(1, x3[0].shape)
    x3 = fel.select(p_inf, x2, x3)
    y3 = fel.select(p_inf, y2, y3)
    z3 = fel.select(p_inf, one, z3)
    return x3, y3, z3


def proj_to_affine_rows(x, y, z, lanes: int = 4096, use_pallas=None):
    """Batch projective->affine on fel rows with one group inversion.
    Infinity (z = 0) maps to (0, 0)."""
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from . import pallas_kernels
        zinv = pallas_kernels.inv_mod_batch_pallas(z)
    else:
        zinv = fel.inv_mod_batch(z, lanes=lanes)
    return fel.mul_mod(x, zinv), fel.mul_mod(y, zinv)

# generator as limb constants
GX = fe.GX_LIMBS
GY = fe.GY_LIMBS


def pts_to_ints(x, y):
    return list(zip(fe.limbs_to_ints(x), fe.limbs_to_ints(y)))


def ints_to_pts(points):
    xs = fe.ints_to_limbs([p[0] for p in points])
    ys = fe.ints_to_limbs([p[1] for p in points])
    return jnp.asarray(xs), jnp.asarray(ys)


# --- affine batch operations -------------------------------------------------

def affine_add(px, py, qx, qy, inv_dx):
    """Chord addition (P != +-Q) with precomputed 1/(qx - px).

    The caller supplies inv_dx from a batch inversion; this keeps the hot
    loop at ~1 sqr + 2 mul per point (reference main.c:374-396 semantics).
    """
    lam = fe.mul_mod_p(fe.sub_mod(qy, py), inv_dx)
    rx = fe.sub_mod(fe.sub_mod(fe.sqr_mod_p(lam), px), qx)
    ry = fe.sub_mod(fe.mul_mod_p(lam, fe.sub_mod(px, rx)), py)
    return rx, ry


def affine_dbl(px, py, inv_2y):
    """Tangent doubling with precomputed 1/(2y)."""
    lam = fe.mul_mod_p(fe.mul_mod_p_small(fe.sqr_mod_p(px), 3), inv_2y)
    rx = fe.sub_mod(fe.sqr_mod_p(lam), fe.mul_mod_p_small(px, 2))
    ry = fe.sub_mod(fe.mul_mod_p(lam, fe.sub_mod(px, rx)), py)
    return rx, ry


def batch_affine_add(px, py, qx, qy, lanes: int = 1024):
    """Full batched affine addition P + Q with one group inversion.

    Handles only the generic chord case (callers on the search hot path
    guarantee P != +-Q by construction, as the reference does).
    """
    dx = fe.sub_mod(qx, px)
    inv_dx = fe.inv_mod_p_batch(dx, lanes=lanes)
    return affine_add(px, py, qx, qy, inv_dx)


def batch_add_or_dbl(px, py, qx, qy, lanes: int = 1024):
    """Batched affine P + Q that also handles P == Q (doubling) by
    sharing the one group inversion (denominator 2y instead of dx).
    P == -Q and infinities are NOT handled (table-construction helper).
    """
    dx = fe.sub_mod(qx, px)
    same = fe.eq(px, qx)
    denom = fe.select(same, fe.mul_mod_p_small(py, 2), dx)
    inv = fe.inv_mod_p_batch(denom, lanes=lanes)
    ax, ay = affine_add(px, py, qx, qy, inv)
    dx_, dy_ = affine_dbl(px, py, inv)
    return fe.select(same, dx_, ax), fe.select(same, dy_, ay)


# --- projective operations -----------------------------------------------------
# Standard homogeneous-projective group law for y^2 = x^3 + 7 (a=0, b=7),
# from the public EFD/Renes-Costello-Batina formulas; complete wrt infinity
# via selects, not asserts (TPU kernels cannot branch per element).

def proj_from_affine(x, y):
    one = jnp.broadcast_to(jnp.asarray(fe.ONE), x.shape)
    return x, y, one


def proj_infinity(shape_like):
    zero = jnp.zeros_like(shape_like)
    one = jnp.broadcast_to(jnp.asarray(fe.ONE), shape_like.shape)
    return zero, one, zero  # (0 : 1 : 0)


def proj_dbl(x1, y1, z1):
    """Projective doubling, a=0 curve. 3M + 4S-equivalent mix (clarity
    first; Pallas kernels own the speed-of-light path)."""
    w = fe.mul_mod_p_small(fe.sqr_mod_p(x1), 3)          # 3*x1^2
    s = fe.mul_mod_p(y1, z1)                              # y1*z1
    b = fe.mul_mod_p(fe.mul_mod_p(x1, y1), s)             # x1*y1*s
    h = fe.sub_mod(fe.sqr_mod_p(w), fe.mul_mod_p_small(b, 8))
    x3 = fe.mul_mod_p(fe.mul_mod_p_small(h, 2), s)
    y3 = fe.sub_mod(
        fe.mul_mod_p(w, fe.sub_mod(fe.mul_mod_p_small(b, 4), h)),
        fe.mul_mod_p_small(fe.sqr_mod_p(fe.mul_mod_p(y1, s)), 8))
    z3 = fe.mul_mod_p_small(fe.mul_mod_p(fe.sqr_mod_p(s), s), 8)
    # doubling of infinity (z=0) or y=0 gives z3=0 -> infinity: correct.
    return x3, y3, z3


def proj_add(x1, y1, z1, x2, y2, z2):
    """Projective addition, complete via selects:
       handles P=inf, Q=inf, P==Q (falls back to dbl), P==-Q (-> inf)."""
    u1 = fe.mul_mod_p(y2, z1)
    u2 = fe.mul_mod_p(y1, z2)
    v1 = fe.mul_mod_p(x2, z1)
    v2 = fe.mul_mod_p(x1, z2)
    u = fe.sub_mod(u1, u2)
    v = fe.sub_mod(v1, v2)

    same_x = fe.is_zero(v)
    same_y = fe.is_zero(u)
    p_inf = fe.is_zero(z1)
    q_inf = fe.is_zero(z2)

    w = fe.mul_mod_p(z1, z2)
    vsq = fe.sqr_mod_p(v)
    vcu = fe.mul_mod_p(vsq, v)
    a = fe.sub_mod(
        fe.sub_mod(fe.mul_mod_p(fe.sqr_mod_p(u), w), vcu),
        fe.mul_mod_p_small(fe.mul_mod_p(vsq, v2), 2))
    x3 = fe.mul_mod_p(v, a)
    y3 = fe.sub_mod(
        fe.mul_mod_p(u, fe.sub_mod(fe.mul_mod_p(vsq, v2), a)),
        fe.mul_mod_p(vcu, u2))
    z3 = fe.mul_mod_p(vcu, w)

    dx, dy, dz = proj_dbl(x1, y1, z1)

    # P == Q (same x, same y, both finite) -> doubling
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    x3 = fe.select(is_dbl, dx, x3)
    y3 = fe.select(is_dbl, dy, y3)
    z3 = fe.select(is_dbl, dz, z3)

    # P == -Q -> infinity (z3 is already 0 in that case: v=0 => vcu=0) ✓

    # P = inf -> Q ; Q = inf -> P
    x3 = fe.select(q_inf, x1, fe.select(p_inf, x2, x3))
    y3 = fe.select(q_inf, y1, fe.select(p_inf, y2, y3))
    z3 = fe.select(q_inf, z1, fe.select(p_inf, z2, z3))
    return x3, y3, z3


def proj_to_affine(x, y, z, lanes: int = 1024):
    """Batch-reduce projective points to affine with one group inversion
    (counterpart of ec_jacobi_grprdc, lib/ecc.c:695-707).
    Infinity (z=0) maps to (0, 0)."""
    zinv = fe.inv_mod_p_batch(z, lanes=lanes)
    ax = fe.mul_mod_p(x, zinv)
    ay = fe.mul_mod_p(y, zinv)
    return ax, ay


def proj_add_affine(x1, y1, z1, x2, y2):
    """Mixed addition: projective P + affine Q (z2=1 saves 3 muls).
    Complete via selects like proj_add."""
    u1 = fe.mul_mod_p(y2, z1)
    v1 = fe.mul_mod_p(x2, z1)
    u = fe.sub_mod(u1, y1)
    v = fe.sub_mod(v1, x1)

    same_x = fe.is_zero(v)
    same_y = fe.is_zero(u)
    p_inf = fe.is_zero(z1)

    vsq = fe.sqr_mod_p(v)
    vcu = fe.mul_mod_p(vsq, v)
    a = fe.sub_mod(
        fe.sub_mod(fe.mul_mod_p(fe.sqr_mod_p(u), z1), vcu),
        fe.mul_mod_p_small(fe.mul_mod_p(vsq, x1), 2))
    x3 = fe.mul_mod_p(v, a)
    y3 = fe.sub_mod(
        fe.mul_mod_p(u, fe.sub_mod(fe.mul_mod_p(vsq, x1), a)),
        fe.mul_mod_p(vcu, y1))
    z3 = fe.mul_mod_p(vcu, z1)

    dx, dy, dz = proj_dbl(x1, y1, z1)
    is_dbl = same_x & same_y & ~p_inf
    x3 = fe.select(is_dbl, dx, x3)
    y3 = fe.select(is_dbl, dy, y3)
    z3 = fe.select(is_dbl, dz, z3)

    one = jnp.broadcast_to(jnp.asarray(fe.ONE), x3.shape)
    x3 = fe.select(p_inf, x2, x3)
    y3 = fe.select(p_inf, y2, y3)
    z3 = fe.select(p_inf, one, z3)
    return x3, y3, z3


# --- jacobian operations (v2 coordinate system) -------------------------------
# Counterpart of the reference's alternate point-op set (_ec_jacobi_add2 /
# _ec_jacobi_dbl2 / _ec_jacobi_rdc2, lib/ecc.c:711-806).  Coordinates are
# x = X/Z^2, y = Y/Z^3; infinity is Z == 0.  The reference compiles v2 but
# dispatches v1 (ecc.c:812-815) because adds dominate its workload and the
# projective add is cheaper; the same trade holds here, so the production
# engines use the projective ops above — v2 exists for parity, for the bench
# comparison rows (lib/bench.c:33-36), and as an independent cross-check of
# the projective formulas (test_ecc.py).  Formulas are the standard public
# Jacobian add/double for a = 0 curves, made complete with selects instead
# of the reference's asserts (TPU kernels cannot branch per element).

def jac_from_affine(x, y):
    one = jnp.broadcast_to(jnp.asarray(fe.ONE), x.shape)
    return x, y, one


def jac_dbl(x1, y1, z1):
    """Jacobian doubling, a=0 curve (2M + 5S core).

    Doubling of infinity (z=0) or of a y=0 point yields z3=0: correct
    (secp256k1 has no order-2 points, but the select-free property means
    no special casing is needed)."""
    a = fe.sqr_mod_p(x1)                                   # X1^2
    b = fe.sqr_mod_p(y1)                                   # Y1^2
    c = fe.sqr_mod_p(b)                                    # Y1^4
    # D = 2*((X1+B)^2 - A - C) = 4*X1*Y1^2
    d = fe.mul_mod_p_small(
        fe.sub_mod(fe.sub_mod(fe.sqr_mod_p(fe.add_mod(x1, b)), a), c), 2)
    e = fe.mul_mod_p_small(a, 3)                           # 3*X1^2
    x3 = fe.sub_mod(fe.sqr_mod_p(e), fe.mul_mod_p_small(d, 2))
    y3 = fe.sub_mod(fe.mul_mod_p(e, fe.sub_mod(d, x3)),
                    fe.mul_mod_p_small(c, 8))
    z3 = fe.mul_mod_p_small(fe.mul_mod_p(y1, z1), 2)
    return x3, y3, z3


def jac_add(x1, y1, z1, x2, y2, z2):
    """Jacobian addition, complete via selects: handles P=inf, Q=inf,
    P==Q (falls back to jac_dbl) and P==-Q (-> infinity)."""
    z1z1 = fe.sqr_mod_p(z1)
    z2z2 = fe.sqr_mod_p(z2)
    u1 = fe.mul_mod_p(x1, z2z2)
    u2 = fe.mul_mod_p(x2, z1z1)
    s1 = fe.mul_mod_p(fe.mul_mod_p(y1, z2), z2z2)
    s2 = fe.mul_mod_p(fe.mul_mod_p(y2, z1), z1z1)
    h = fe.sub_mod(u2, u1)
    r = fe.sub_mod(s2, s1)

    same_x = fe.is_zero(h)
    same_y = fe.is_zero(r)
    p_inf = fe.is_zero(z1)
    q_inf = fe.is_zero(z2)

    hh = fe.sqr_mod_p(h)
    hhh = fe.mul_mod_p(h, hh)
    v = fe.mul_mod_p(u1, hh)
    x3 = fe.sub_mod(fe.sub_mod(fe.sqr_mod_p(r), hhh),
                    fe.mul_mod_p_small(v, 2))
    y3 = fe.sub_mod(fe.mul_mod_p(r, fe.sub_mod(v, x3)),
                    fe.mul_mod_p(s1, hhh))
    z3 = fe.mul_mod_p(fe.mul_mod_p(z1, z2), h)

    # P == Q (same x, same y, both finite) -> doubling
    dx, dy, dz = jac_dbl(x1, y1, z1)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    x3 = fe.select(is_dbl, dx, x3)
    y3 = fe.select(is_dbl, dy, y3)
    z3 = fe.select(is_dbl, dz, z3)

    # P == -Q -> infinity (h = 0 already forces z3 = 0) ✓

    # P = inf -> Q ; Q = inf -> P (both inf -> z1 = 0 -> infinity) ✓
    x3 = fe.select(q_inf, x1, fe.select(p_inf, x2, x3))
    y3 = fe.select(q_inf, y1, fe.select(p_inf, y2, y3))
    z3 = fe.select(q_inf, z1, fe.select(p_inf, z2, z3))
    return x3, y3, z3


def jac_to_affine(x, y, z, lanes: int = 1024):
    """Batch-reduce Jacobian points to affine with one group inversion
    (counterpart of _ec_jacobi_rdc2/_grprdc2, lib/ecc.c:780-806).
    Infinity (z=0) maps to (0, 0)."""
    zinv = fe.inv_mod_p_batch(z, lanes=lanes)
    zinv2 = fe.sqr_mod_p(zinv)
    ax = fe.mul_mod_p(x, zinv2)
    ay = fe.mul_mod_p(y, fe.mul_mod_p(zinv2, zinv))
    return ax, ay


# --- scalar multiplication ------------------------------------------------------

def scalar_mul(k_limbs, px=None, py=None):
    """Batched double-and-add: k * P for k given as (..., 16) limbs.

    MSB-first would need no extra state; LSB-first matches a running
    doubling chain.  Used for center-point initialization and on-device
    verification — NOT the mul-mode hot path (that's the gtable).
    Counterpart of ec_jacobi_mul (lib/ecc.c:821-843).
    """
    if px is None:
        px = jnp.broadcast_to(jnp.asarray(GX), k_limbs.shape)
        py = jnp.broadcast_to(jnp.asarray(GY), k_limbs.shape)
    ax, ay, az = proj_infinity(px)
    bx, by, bz = proj_from_affine(px, py)

    def step(carry, bit_idx):
        ax, ay, az, bx, by, bz = carry
        limb = bit_idx // fe.LIMB_BITS
        shift = bit_idx % fe.LIMB_BITS
        bit = (jnp.take(k_limbs, limb, axis=-1) >> shift) & 1
        nx, ny, nz = proj_add(ax, ay, az, bx, by, bz)
        ax = fe.select(bit == 1, nx, ax)
        ay = fe.select(bit == 1, ny, ay)
        az = fe.select(bit == 1, nz, az)
        bx, by, bz = proj_dbl(bx, by, bz)
        return (ax, ay, az, bx, by, bz), None

    init = (ax, ay, az, bx, by, bz)
    # Outside jit on CPU, lax.scan would still XLA-compile its whole
    # 256-iteration body as one computation (minutes on one core); a
    # Python loop dispatches the cached per-op executables instead.
    # Under a trace (jit/shard_map callers) keep lax.scan — unrolling
    # 256 projective adds into the graph is the pathological case.
    from .search.add import _use_jit
    if isinstance(k_limbs, jax.core.Tracer) or _use_jit():
        (ax, ay, az, _, _, _), _ = jax.lax.scan(
            step, init, jnp.arange(256, dtype=jnp.int32))
    else:
        carry = init
        for i in range(256):
            carry, _ = step(carry, i)
        ax, ay, az = carry[:3]
    return ax, ay, az


def on_curve(x, y):
    """y^2 == x^3 + 7 for affine batches (ec_verify counterpart)."""
    lhs = fe.sqr_mod_p(y)
    rhs = fe.add_mod(fe.mul_mod_p(fe.sqr_mod_p(x), x),
                     jnp.broadcast_to(fe.const(7), x.shape))
    return fe.eq(lhs, rhs)
