"""256-bit field arithmetic for secp256k1, vectorized for TPU.

TPU-first representation (the foundational design decision, SURVEY.md §7):
the VPU has no 64-bit scalar multiply and no carry flag, so a field element
is **16 little-endian limbs of 16 bits each, stored in uint32 lanes**.
A 16x16->32-bit product fits exactly in a uint32, and an entire schoolbook
column (<=16 lo-halves + 16 hi-halves, each < 2^16) accumulates in uint32
without overflow, so carries are resolved in a single normalization sweep
per multiply instead of per-step carry chains.  Everything below is written
on jnp arrays with a leading batch shape `(...,)` and trailing limb axis of
16 (or 32 for double-width), so one call processes O(10^3..10^6) field
elements — the TPU replacement for the reference's u64 carry-intrinsic
chains (reference semantics: /root/reference/lib/ecc.c:26-540).

The same functions run under `jit` on TPU and CPU, inside `shard_map`, and
inside Pallas kernels (they are pure jnp ops on uint32).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import golden


def _unroll_default() -> bool:
    """Unroll sequential loops (inversion chain / prefix scans) into the
    traced graph.  Saves per-iteration while-loop latency on TPU (the
    bodies are tiny relative to launch overhead); kept off on CPU where
    giant fused blocks send LLVM compile time superlinear.  One shared
    policy (ecloop_tpu.policy), ECLOOP_FE_UNROLL site override."""
    from .policy import tpu_graph_forms
    return tpu_graph_forms("ECLOOP_FE_UNROLL")

# --- constants ---------------------------------------------------------------

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

P = golden.P
N_ORDER = golden.N
# p = 2^256 - PCOMP, with PCOMP = 2^32 + 977 = 0x1000003D1.  The reduction
# folds high limbs back with multiply-by-PCOMP (same folding idea as the
# reference's 0x1000003D1 trick, /root/reference/lib/ecc.c:307-347, re-derived
# for the 16-bit limb scheme).
PCOMP = (1 << 256) - P
assert PCOMP == 0x1000003D1


def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """Python int -> uint32 limb vector (static/host)."""
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.uint32)


def limbs_to_int(a) -> int:
    """uint32 limb vector -> Python int (host, single element)."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a.tolist()))


def ints_to_limbs(xs, n: int = NLIMBS) -> np.ndarray:
    """List of Python ints -> (len, n) uint32 limb array."""
    out = np.empty((len(xs), n), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[i] = int_to_limbs(x, n)
    return out


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]


P_LIMBS = int_to_limbs(P)
N_LIMBS = int_to_limbs(N_ORDER)
PCOMP_LIMBS = int_to_limbs(PCOMP, 3)  # [0x03D1, 0x0000, 0x0001]
ZERO = int_to_limbs(0)
ONE = int_to_limbs(1)

# 2*P for lazy-reduction headroom checks (not currently used on hot path)
BETA1_LIMBS = int_to_limbs(golden.BETA1)
BETA2_LIMBS = int_to_limbs(golden.BETA2)
GX_LIMBS = int_to_limbs(golden.GX)
GY_LIMBS = int_to_limbs(golden.GY)

_U32 = jnp.uint32


def const(x: int, n: int = NLIMBS) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(x, n))


# --- generic limb helpers ----------------------------------------------------

def normalize(cols: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Carry-propagate columns (each < 2^32) into canonical 16-bit limbs.

    `cols` has shape (..., K); result (..., out_limbs or K).  The final carry
    must be zero (caller guarantees headroom) unless out_limbs > K.
    """
    k = cols.shape[-1]
    out_limbs = out_limbs or k
    outs = []
    c = jnp.zeros(cols.shape[:-1], dtype=_U32)
    for i in range(k):
        v = cols[..., i] + c
        outs.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    for _ in range(k, out_limbs):
        outs.append(c & LIMB_MASK)
        c = c >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def _raw_sub(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a - b with borrow chain. Returns (diff_limbs, borrow_out in {0,1})."""
    n = a.shape[-1]
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=_U32)
    for i in range(n):
        v = a[..., i] - b[..., i] - borrow  # uint32 wraps; track via compare
        outs.append(v & LIMB_MASK)
        # borrow if a_i < b_i + borrow (b_i + borrow <= 2^16, fits)
        borrow = (a[..., i] < b[..., i] + borrow).astype(_U32)
    return jnp.stack(outs, axis=-1), borrow


def _raw_add(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a + b with carry chain. Returns (sum_limbs, carry_out)."""
    n = a.shape[-1]
    outs = []
    carry = jnp.zeros(a.shape[:-1], dtype=_U32)
    for i in range(n):
        v = a[..., i] + b[..., i] + carry
        outs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b, elementwise over batch (bool)."""
    _, borrow = _raw_sub(a, b)
    return borrow == 0


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(cond, a, b) with cond batched (broadcast over limb axis)."""
    return jnp.where(cond[..., None], a, b)


def _cond_sub(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a - m if a >= m else a (single conditional subtract)."""
    d, borrow = _raw_sub(a, m)
    return select(borrow == 0, d, a)


# --- mod-p arithmetic ----------------------------------------------------------

def add_mod(a: jnp.ndarray, b: jnp.ndarray, m: jnp.ndarray = None) -> jnp.ndarray:
    """(a + b) mod m for a,b < m (default m = p)."""
    m = P_LIMBS if m is None else m
    mj = jnp.asarray(m)
    s, carry = _raw_add(a, b)
    d, borrow = _raw_sub(s, jnp.broadcast_to(mj, s.shape))
    # subtract m if sum >= m: that is carry==1 (sum >= 2^256 > m) or borrow==0
    take_d = (carry == 1) | (borrow == 0)
    return select(take_d, d, s)


def sub_mod(a: jnp.ndarray, b: jnp.ndarray, m: jnp.ndarray = None) -> jnp.ndarray:
    """(a - b) mod m for a,b < m."""
    m = P_LIMBS if m is None else m
    mj = jnp.asarray(m)
    d, borrow = _raw_sub(a, b)
    d2, _ = _raw_add(d, jnp.broadcast_to(mj, d.shape))
    return select(borrow == 0, d, d2)


def neg_mod(a: jnp.ndarray, m: jnp.ndarray = None) -> jnp.ndarray:
    """(-a) mod m; maps 0 -> 0."""
    m = P_LIMBS if m is None else m
    mj = jnp.broadcast_to(jnp.asarray(m), a.shape)
    d, _ = _raw_sub(mj, a)
    return select(is_zero(a), a, d)


def _shift_limbs(x: jnp.ndarray, left: int, width: int) -> jnp.ndarray:
    """Pad limb vector x to `width` limbs, shifted `left` positions up.
    (pad instead of scatter: XLA scatters are catastrophically slow to
    compile/run; pads fuse into elementwise code.)"""
    pad = [(0, 0)] * (x.ndim - 1) + [(left, width - left - x.shape[-1])]
    return jnp.pad(x, pad)


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 256x256 -> 512-bit schoolbook product, (..., 32) normalized limbs.

    Column accumulation in uint32: column k sums <=16 lo-halves
    (i+j == k) and <=16 hi-halves (i+j == k-1) of 16x16 products, all
    < 2^16, so max < 2^21 — no intermediate carries needed (the
    carry-saved trick that replaces the reference's u128/addc64 chains).
    Diagonal gathering with static indices keeps the add count at ~2
    per product instead of the padded-row formulation's ~4.
    """
    p = a[..., :, None] * b[..., None, :]   # (..., 16, 16) uint32 products
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    if not _unroll_default():
        # padded-row accumulation: fewer, wider HLO ops — much cheaper
        # for XLA:CPU to compile (tests), slightly more vector adds
        w = 2 * NLIMBS
        cols = jnp.zeros(a.shape[:-1] + (w,), dtype=_U32)
        for i in range(NLIMBS):
            cols = cols + _shift_limbs(lo[..., i, :], i, w)
            cols = cols + _shift_limbs(hi[..., i, :], i + 1, w)
        return normalize(cols)
    cols = []
    zero = jnp.zeros(a.shape[:-1], dtype=_U32)
    for k in range(2 * NLIMBS):
        acc = None
        for i in range(NLIMBS):
            j = k - i
            if 0 <= j < NLIMBS:
                t = lo[..., i, j]
                acc = t if acc is None else acc + t
            j = k - 1 - i
            if 0 <= j < NLIMBS:
                t = hi[..., i, j]
                acc = t if acc is None else acc + t
        cols.append(zero if acc is None else acc)
    return normalize(jnp.stack(cols, axis=-1))


def sqr_wide(a: jnp.ndarray) -> jnp.ndarray:
    """Dedicated squaring: only the 136 upper-triangle products, with
    off-diagonal terms doubled during column accumulation (same idea as
    the reference's dedicated sqr, /root/reference/lib/ecc.c:349-444,
    re-derived for the limb scheme).  Column bound: <=8 doubled pairs
    (2^17 each) + diagonal + hi terms < 2^21: safe in uint32."""
    if not _unroll_default():
        return mul_wide(a, a)
    prods = {}
    for i in range(NLIMBS):
        for j in range(i, NLIMBS):
            prods[(i, j)] = a[..., i] * a[..., j]
    cols = []
    zero = jnp.zeros(a.shape[:-1], dtype=_U32)
    for k in range(2 * NLIMBS):
        acc = None

        def add(t, acc=None):
            return t if acc is None else acc + t

        for i in range(NLIMBS):
            for (jj, shift) in ((k - i, 0), (k - 1 - i, LIMB_BITS)):
                if i <= jj < NLIMBS:
                    p = prods[(i, jj)]
                    half = (p >> shift) & LIMB_MASK
                    acc = add(half if i == jj else half << 1, acc)
        cols.append(zero if acc is None else acc)
    # off-diagonal doubling makes columns < 2^22: still carry-safe
    return normalize(jnp.stack(cols, axis=-1))


def _fold_p(wide: jnp.ndarray) -> jnp.ndarray:
    """Reduce a (..., 32)-limb value X = Hi*2^256 + Lo to (..., 16) mod p,
    using X ≡ Lo + Hi*PCOMP (mod p), iterated.
    Result is fully reduced (< p)."""
    w = NLIMBS + 4
    lo = wide[..., :NLIMBS]
    hi = wide[..., NLIMBS:]
    # hi * PCOMP: PCOMP = 2^32 + 0x3D1 -> hi*0x3D1 (products < 2^26) + hi << 32
    cols = (_shift_limbs(lo, 0, w)
            + _shift_limbs(hi * np.uint32(0x03D1), 0, w)
            + _shift_limbs(hi, 2, w))                 # col max < 2^26+2^17: safe
    r1 = normalize(cols)                              # (..., 20), < 2^290

    lo = r1[..., :NLIMBS]
    hi = r1[..., NLIMBS:]                             # (..., 4), < 2^34
    cols = (lo
            + _shift_limbs(hi * np.uint32(0x03D1), 0, NLIMBS)
            + _shift_limbs(hi, 2, NLIMBS))
    r2 = normalize(cols, out_limbs=NLIMBS + 1)        # (..., 17), < 2^257

    # third fold: top is a single bit (r2 < 2^257 => hi <= 1)
    lo = r2[..., :NLIMBS]
    hi = r2[..., NLIMBS:]                              # (..., 1), 0 or 1
    cols = (lo
            + _shift_limbs(hi * np.uint32(0x03D1), 0, NLIMBS)
            + _shift_limbs(hi, 2, NLIMBS))
    r3 = normalize(cols)                               # (..., 16), < 2^256 + eps

    # r3 may still be in [p, 2^256): one conditional subtract suffices since
    # r3 < p + 2^33 < 2p
    return _cond_sub(r3, jnp.broadcast_to(jnp.asarray(P_LIMBS), r3.shape))


def mul_mod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _fold_p(mul_wide(a, b))


def sqr_mod_p(a: jnp.ndarray) -> jnp.ndarray:
    return _fold_p(sqr_wide(a))


def mul_mod_p_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k mod p for a small constant k < 2^16 (e.g. 2, 3, 7, 8)."""
    cols = a * np.uint32(k)
    r = normalize(cols, out_limbs=NLIMBS + 1)
    lo = r[..., :NLIMBS]
    hi = r[..., NLIMBS:]
    cols = (lo
            + _shift_limbs(hi * np.uint32(0x03D1), 0, NLIMBS)
            + _shift_limbs(hi, 2, NLIMBS))
    out = normalize(cols)
    out = _cond_sub(out, jnp.broadcast_to(jnp.asarray(P_LIMBS), out.shape))
    return out


# --- modular inverse -----------------------------------------------------------

def _inv_binpow_scan(a: jnp.ndarray) -> jnp.ndarray:
    """Batched a^(p-2) mod p as MSB-first square-and-multiply in ONE
    lax.scan (the reference's alternate `_fe_modp_inv_binpow` form,
    lib/ecc.c:446-468).  ~1.9x the runtime of the addition chain (255
    conditional muls always evaluated) but a single sqr+mul loop body —
    XLA:CPU compiles it in seconds where the chain's ~32 distinct
    inlined field-op bodies take >90 s on one core, which is why this
    is the CPU-default form (the dryrun/CI compile path)."""
    e = P - 2
    bits = jnp.asarray([(e >> (255 - i)) & 1 for i in range(256)],
                       dtype=bool)

    def body(x, b):
        x = sqr_mod_p(x)
        return jnp.where(b, mul_mod_p(x, a), x), None

    # MSB of p-2 is 1: seed with a, consume the remaining 255 bits
    x, _ = jax.lax.scan(body, a, bits[1:])
    return x


def inv_mod_p(a: jnp.ndarray) -> jnp.ndarray:
    """Batched a^(p-2) mod p via a short addition chain (~255 sqr + 15 mul).

    The chain exploits p-2 = 2^256 - 2^32 - 979 being mostly runs of ones;
    it is the standard public secp256k1 inversion ladder (cf. bitcoin-core
    field_inv; the reference uses the same idea, lib/ecc.c:446-520).  The
    chain below is verified symbolically in tests/test_fe.py by tracking
    exponents with Python ints.  On CPU the binpow scan form (above) is
    used instead — same results, far cheaper compile.
    """
    if not _unroll_default():
        return _inv_binpow_scan(a)
    sqr, mul = sqr_mod_p, mul_mod_p

    def sqrn(x, n):
        # TPU: unroll — the 255 sequential squarings are tiny kernels
        # whose while-loop iteration latency dominates; unrolled they
        # fuse.  CPU: fori_loop keeps the traced graph small (LLVM
        # compile blows up on the fused block).
        if n <= 2:
            for _ in range(n):
                x = sqr(x)
            return x
        if _unroll_default():
            # partial unroll: 8 squarings per while-loop iteration cuts
            # the loop-latency 8x at ~8x body size (still compilable)
            u = 8
            for _ in range(n % u):
                x = sqr(x)
            if n // u:
                x = jax.lax.fori_loop(
                    0, n // u, lambda _, v: sqrn_u(v, u), x)
            return x
        return jax.lax.fori_loop(0, n, lambda _, v: sqr(v), x)

    def sqrn_u(x, u):
        for _ in range(u):
            x = sqr(x)
        return x

    x1 = a                      # a^(2^1 - 1)
    x2 = mul(sqr(x1), x1)       # a^(2^2 - 1)
    x3 = mul(sqr(x2), x1)       # a^(2^3 - 1)
    x6 = mul(sqrn(x3, 3), x3)
    x9 = mul(sqrn(x6, 3), x3)
    x11 = mul(sqrn(x9, 2), x2)
    x22 = mul(sqrn(x11, 11), x11)
    x44 = mul(sqrn(x22, 22), x22)
    x88 = mul(sqrn(x44, 44), x44)
    x176 = mul(sqrn(x88, 88), x88)
    x220 = mul(sqrn(x176, 44), x44)
    x223 = mul(sqrn(x220, 3), x3)
    # assemble p - 2 = [223 ones] 0 [22 ones] 0 0 1 0 0 0 1 0 1 1 0 1
    t = mul(sqrn(x223, 23), x22)
    t = mul(sqrn(t, 5), x1)
    t = mul(sqrn(t, 3), x2)
    t = mul(sqrn(t, 2), x1)
    return t


def _chain_exponent() -> int:
    """Host-side mirror of inv_mod_p's chain on integer exponents
    (used by tests to prove the chain computes a^(p-2))."""
    def sqrn(e, n):
        return e << n
    x1 = 1
    x2 = sqrn(x1, 1) + x1
    x3 = sqrn(x2, 1) + x1
    x6 = sqrn(x3, 3) + x3
    x9 = sqrn(x6, 3) + x3
    x11 = sqrn(x9, 2) + x2
    x22 = sqrn(x11, 11) + x11
    x44 = sqrn(x22, 22) + x22
    x88 = sqrn(x44, 44) + x44
    x176 = sqrn(x88, 88) + x88
    x220 = sqrn(x176, 44) + x44
    x223 = sqrn(x220, 3) + x3
    t = sqrn(x223, 23) + x22
    t = sqrn(t, 5) + x1
    t = sqrn(t, 3) + x2
    t = sqrn(t, 2) + x1
    return t


def inv_mod_p_batch(x: jnp.ndarray, lanes: int = 1024) -> jnp.ndarray:
    """Montgomery batch inversion of a flat batch (..., B, 16) along axis -2.

    Blocked design for TPU: the inherently sequential prefix product runs
    along a short scan axis while staying `lanes`-wide in the vector unit;
    the `lanes` block totals are then inverted together with one batched
    Fermat chain (SURVEY.md §7 'hard parts').  Cost per element ~3 muls +
    (chain cost) * lanes / B.

    Zero inputs are mapped to zero outputs (matching fe_modp_grpinv's
    implicit contract of never receiving zeros — we tolerate them so hit
    masking can use dummy values).
    """
    shape = x.shape
    b = shape[-2]
    flat = x.reshape((-1, b, NLIMBS))
    zmask = is_zero(flat)
    one = jnp.broadcast_to(jnp.asarray(ONE), flat.shape)
    safe = select(zmask, one, flat)

    w = min(lanes, b)
    while b % w:
        w -= 1
    s = b // w
    g = safe.reshape((-1, s, w, NLIMBS))
    gs = jnp.moveaxis(g, 1, 0)                # (s, batch, w, 16) scan axis first

    unroll = min(s, 16) if _unroll_default() else 1

    # forward scan: prefixes[i] = g[0] * ... * g[i]
    def fwd(carry, gi):
        nxt = mul_mod_p(carry, gi)
        return nxt, nxt

    total, rest = jax.lax.scan(fwd, gs[0], gs[1:], unroll=unroll)
    prefixes = jnp.concatenate([gs[:1], rest], axis=0)   # (s, batch, w, 16)

    # two-level: at large widths, inverting the w block totals with the
    # full Fermat chain costs 270*w muls; a second Montgomery level over
    # the totals cuts the chain width 16x for 3 muls/total
    if w >= 2048:
        inv_total = inv_mod_p_batch(total, lanes=max(256, w // 16))
    else:
        inv_total = inv_mod_p(total)

    # backward scan: out[i] = inv(prefix[i]) * prefix[i-1]; acc walks down
    def bwd(acc, xs):
        gi, prev_prefix = xs
        out_i = mul_mod_p(acc, prev_prefix)
        acc = mul_mod_p(acc, gi)
        return acc, out_i

    if s > 1:
        acc, outs_rev = jax.lax.scan(
            bwd, inv_total, (gs[1:][::-1], prefixes[:-1][::-1]),
            unroll=unroll)
        inv = jnp.concatenate([acc[None], outs_rev[::-1]], axis=0)
    else:
        inv = inv_total[None]
    inv = jnp.moveaxis(inv, 0, 1).reshape((-1, b, NLIMBS))

    inv = select(zmask, jnp.zeros_like(inv), inv)
    return inv.reshape(shape)


# --- host-side mod-n helpers (order arithmetic is host-only) -------------------
# The reference's fe_modn_* family (lib/ecc.c:164-265) exists to advance
# stride keys and recover private keys; on TPU these are rare host-side
# scalar ops, done in Python ints (see search/common.py).
