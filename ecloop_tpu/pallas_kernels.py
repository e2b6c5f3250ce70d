"""Pallas TPU kernels for the hot sequential path.

The batch Montgomery inversion is the one inherently sequential part of
the search step (SURVEY.md §7 'hard parts'): a blocked prefix product +
one Fermat-chain inversion + back-substitution.  Under plain XLA each of
the ~400 sequential small modmuls is its own kernel launch, and launch
overhead dominates the whole step.  This kernel runs the ENTIRE batch
inversion in one Pallas program: prefix scan, two-level block totals,
the 270-step Fermat chain, and back-substitution all execute in VMEM
with zero inter-iteration launch cost.

Layout: a field element batch is 16 limb rows (fel.py).  In-kernel, a
"row block" has shape (S, SUB, 128): S sequential scan steps over
SUB*128 parallel chains, so every VPU op inside the scan runs on a full
(SUB, 128) tile.  The kernel takes the 16 limb rows as 16 separate refs
(no host-side restacking; the (B,) -> (S, SUB, 128) reshape is a free
view).

Grid: one program per SEGMENT of the batch; segments are independent
(each does its own full inversion), which also keeps VMEM bounded.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fe, fel

NLIMBS = 16
SUB = 8          # sublanes per row tile
LANE = 128       # lanes per row tile
W = SUB * LANE   # parallel chains per segment scan


def _mul(a, b):
    return fel.mul_mod(a, b)


def _sqr(a):
    return fel.sqr_mod(a)


def _inv_chain(a):
    """Fermat chain on small row tuples; fori_loop bodies stay tiny
    (in-kernel loops have no launch overhead)."""
    def sqrn(x, n):
        if n <= 2:
            for _ in range(n):
                x = _sqr(x)
            return x
        return jax.lax.fori_loop(0, n, lambda _, v: _sqr(v), x)

    x1 = a
    x2 = _mul(_sqr(x1), x1)
    x3 = _mul(_sqr(x2), x1)
    x6 = _mul(sqrn(x3, 3), x3)
    x9 = _mul(sqrn(x6, 3), x3)
    x11 = _mul(sqrn(x9, 2), x2)
    x22 = _mul(sqrn(x11, 11), x11)
    x44 = _mul(sqrn(x22, 22), x22)
    x88 = _mul(sqrn(x44, 44), x44)
    x176 = _mul(sqrn(x88, 88), x88)
    x220 = _mul(sqrn(x176, 44), x44)
    x223 = _mul(sqrn(x220, 3), x3)
    t = _mul(sqrn(x223, 23), x22)
    t = _mul(sqrn(t, 5), x1)
    t = _mul(sqrn(t, 3), x2)
    t = _mul(sqrn(t, 2), x1)
    return t


def _inv_kernel(s_steps: int, *refs):
    """refs: 16 input limb refs (S, SUB, LANE), 16 output limb refs,
    1 prefix-scratch ref (S, 16, SUB, LANE)."""
    g_refs = refs[:NLIMBS]
    o_refs = refs[NLIMBS:2 * NLIMBS]
    pfx = refs[2 * NLIMBS]

    def load(i):
        return tuple(r[i] for r in g_refs)

    # ---- forward prefix scan ------------------------------------------------
    cur = load(0)
    for limb in range(NLIMBS):
        pfx[0, limb] = cur[limb]

    def fwd_body(i, cur):
        cur = _mul(cur, load(i))
        for limb in range(NLIMBS):
            pfx[i, limb] = cur[limb]
        return cur

    cur = jax.lax.fori_loop(1, s_steps, fwd_body, cur)

    # ---- invert the W block totals ------------------------------------------
    # second-level prefix over the sublane axis: SUB chains of LANE
    t = tuple(r[0:1] for r in cur)                    # (1, LANE)
    t2 = [t]
    for k in range(1, SUB):
        t = _mul(t, tuple(r[k:k + 1] for r in cur))
        t2.append(t)
    tinv = _inv_chain(t)                              # (1, LANE) inverses
    # back-substitute level 2: inv of each sublane row
    inv_rows = [None] * SUB
    acc = tinv
    for k in range(SUB - 1, 0, -1):
        inv_rows[k] = _mul(acc, t2[k - 1])
        acc = _mul(acc, tuple(r[k:k + 1] for r in cur))
    inv_rows[0] = acc
    inv_tot = tuple(jnp.concatenate([inv_rows[k][limb] for k in range(SUB)],
                                    axis=0)
                    for limb in range(NLIMBS))        # (SUB, LANE)

    # ---- backward substitution ----------------------------------------------
    def bwd_body(j, acc):
        i = s_steps - 1 - j
        prev = tuple(pfx[i - 1, limb] for limb in range(NLIMBS))
        out_i = _mul(acc, prev)
        for limb in range(NLIMBS):
            o_refs[limb][i] = out_i[limb]
        return _mul(acc, load(i))

    acc = jax.lax.fori_loop(0, s_steps - 1, bwd_body, inv_tot)
    for limb in range(NLIMBS):
        o_refs[limb][0] = acc[limb]


@functools.lru_cache(maxsize=8)
def _build_inv(seg_elems: int, n_segs: int):
    s_steps = seg_elems // W
    kern = functools.partial(_inv_kernel, s_steps)
    blk = (s_steps, SUB, LANE)
    in_specs = [pl.BlockSpec(blk, lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)] * NLIMBS
    out_specs = [pl.BlockSpec(blk, lambda g: (g, 0, 0),
                              memory_space=pltpu.VMEM)] * NLIMBS
    shape = (n_segs * s_steps, SUB, LANE)
    call = pl.pallas_call(
        kern,
        grid=(n_segs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.uint32)] * NLIMBS,
        scratch_shapes=[pltpu.VMEM((s_steps, NLIMBS, SUB, LANE),
                                   jnp.uint32)],
    )
    return call


def _hash_kernel(is33: bool, *refs):
    """refs: 16 x-limb refs, 16 y-limb refs, 5 hash160 word refs — each
    (S, SUB, LANE).  The whole serialize -> SHA-256 -> RIPEMD-160 chain
    runs on VMEM values (the unrolled jnp round functions trace into the
    kernel), so the 64-entry SHA message schedule and every round
    intermediate stay on-chip instead of round-tripping to HBM between
    XLA fusion segments."""
    from . import hash160
    x = tuple(r[:] for r in refs[:NLIMBS])
    y = tuple(r[:] for r in refs[NLIMBS:2 * NLIMBS])
    if is33:
        h = hash160.addr33_hash_rows(x, y)
    else:
        h = hash160.addr65_hash_rows(x, y)
    for i in range(5):
        refs[2 * NLIMBS + i][:] = h[i]


@functools.lru_cache(maxsize=16)
def _build_hash(is33: bool, n_tiles: int, s_blk: int):
    kern = functools.partial(_hash_kernel, is33)
    blk = (s_blk, SUB, LANE)
    spec = pl.BlockSpec(blk, lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    shape = (n_tiles, SUB, LANE)
    return pl.pallas_call(
        kern,
        grid=(n_tiles // s_blk,),
        in_specs=[spec] * (2 * NLIMBS),
        out_specs=[spec] * 5,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.uint32)] * 5,
    )


def _hash_rows_pallas(is33: bool, x_rows, y_rows):
    shape = x_rows[0].shape
    n = int(np.prod(shape))
    assert n % W == 0, shape
    n_tiles = n // W
    s_blk = next(s for s in (8, 4, 2, 1) if n_tiles % s == 0)
    shaped = [r.reshape(n_tiles, SUB, LANE) for r in (*x_rows, *y_rows)]
    out = _build_hash(is33, n_tiles, s_blk)(*shaped)
    return [r.reshape(shape) for r in out]


def addr33_hash_rows_pallas(x_rows, y_rows):
    """hash160 of compressed pubkeys (fused Pallas kernel); rows may be
    any shape with size % 1024 == 0.  Output: 5 u32 word rows."""
    return _hash_rows_pallas(True, x_rows, y_rows)


def addr65_hash_rows_pallas(x_rows, y_rows):
    """hash160 of uncompressed pubkeys (fused Pallas kernel)."""
    return _hash_rows_pallas(False, x_rows, y_rows)


def _mixed_add_kernel(complete: bool, *refs):
    """refs: 16 qx + 16 qy + 16 qz (projective accumulator), 16 gx +
    16 gy (affine table point), 1 skip row — each (S, SUB, LANE);
    outputs 16 nx + 16 ny + 16 nz.

    One gtable window step of the mul scan (search/mul.make_mul_step):
    mixed projective+affine add with the skip select (zero digit ->
    carry passthrough) folded in.  Keeping the ~12 unrolled modmuls of
    the add INSIDE one Mosaic program is what makes the mul step's XLA
    graph small: with them inlined in XLA the whole-step cold compile
    through the remote relay was ~37 min (r5 measured, r4 stage C
    1224 s for the addr33-only graph) — the same superlinear-compile
    class the Pallas hash fix (814cd48) addressed for the hash rounds.
    """
    from . import ecc
    q = [tuple(r[:] for r in refs[i * NLIMBS:(i + 1) * NLIMBS])
         for i in range(5)]
    qx, qy, qz, gx, gy = q
    skip = refs[5 * NLIMBS][:] != 0
    nx, ny, nz = ecc.proj_add_affine_rows(qx, qy, qz, gx, gy,
                                          complete=complete)
    nx = fel.select(skip, qx, nx)
    ny = fel.select(skip, qy, ny)
    nz = fel.select(skip, qz, nz)
    o_refs = refs[5 * NLIMBS + 1:]
    for limb in range(NLIMBS):
        o_refs[limb][:] = nx[limb]
        o_refs[NLIMBS + limb][:] = ny[limb]
        o_refs[2 * NLIMBS + limb][:] = nz[limb]


@functools.lru_cache(maxsize=8)
def _build_mixed_add(complete: bool, n_tiles: int, s_blk: int):
    kern = functools.partial(_mixed_add_kernel, complete)
    blk = (s_blk, SUB, LANE)
    spec = pl.BlockSpec(blk, lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    shape = (n_tiles, SUB, LANE)
    return pl.pallas_call(
        kern,
        grid=(n_tiles // s_blk,),
        in_specs=[spec] * (5 * NLIMBS + 1),
        out_specs=[spec] * (3 * NLIMBS),
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.uint32)] * (3 * NLIMBS),
    )


def proj_add_affine_pallas(qx, qy, qz, gx, gy, skip, complete: bool):
    """Fused gtable window step: (Q + G) with skip passthrough, on fel
    rows of any common shape with size % 1024 == 0; skip is a uint32
    (or bool) row of the same shape.  Returns projective fel rows."""
    shape = qx[0].shape
    n = int(np.prod(shape))
    assert n % W == 0, shape
    n_tiles = n // W
    s_blk = next(s for s in (8, 4, 2, 1) if n_tiles % s == 0)
    rows = [r.reshape(n_tiles, SUB, LANE)
            for r in (*qx, *qy, *qz, *gx, *gy)]
    rows.append(skip.astype(jnp.uint32).reshape(n_tiles, SUB, LANE))
    out = _build_mixed_add(complete, n_tiles, s_blk)(*rows)
    t = tuple(r.reshape(shape) for r in out)
    return t[:NLIMBS], t[NLIMBS:2 * NLIMBS], t[2 * NLIMBS:]


def inv_mod_batch_pallas(x, seg_elems: int = 65536):
    """Batched modular inversion of fel row tuples, shape (B,) each.

    B must be a multiple of W (1024); the caller pads (the search step
    already pads with ones).  Zero inputs map to zero outputs.
    """
    b = int(x[0].shape[-1])
    assert b % W == 0, b
    seg = min(seg_elems, b)
    while b % seg:
        seg -= W
    n_segs = b // seg
    s_steps = seg // W

    zmask = fel.is_zero(x)
    one = fel.const_rows(1, x[0].shape)
    safe = fel.select(zmask, one, x)

    shaped = [r.reshape(n_segs * s_steps, SUB, LANE) for r in safe]
    out = _build_inv(seg, n_segs)(*shaped)
    inv = tuple(r.reshape(b) for r in out)
    return fel.select(zmask, fel.zeros_like(inv), inv)
