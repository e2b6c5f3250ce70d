"""Batched hash160 (SHA-256 -> RIPEMD-160) pipeline on 32-bit lanes.

Both hashes are native 32-bit algorithms — an exact fit for TPU integer
lanes (SURVEY.md §7 step 4).  The pipeline fuses pubkey serialization from
field-element limb planes straight into SHA message words, so no byte-level
data ever materializes on device.

Semantics parity (reference /root/reference/lib/addr.c):
  * addr33: one 64-byte SHA block [02|03, x_be, 0x80 pad, bitlen=264]
  * addr65: two blocks            [04, x_be, y_be, 0x80 pad, bitlen=520]
  * RMD message = SHA digest bytes + 0x80 + bitlen 256
  * output: 5 u32 words in big-endian print order (reference h160_t as
    printed by print_h160 / compare_160)

All functions take/return uint32 arrays with a leading batch shape.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import fe

# Round-loop structure: "unroll" traces all hash rounds into one fused
# elementwise chain (best TPU runtime; heavy compile), "scan" runs them
# as lax.scan loops (fast compile; per-iteration loop latency).  The
# TPU default is unroll; CPU (tests/golden checks) defaults to scan
# because XLA:CPU's LLVM pipeline is pathological on the giant fused
# block.  Override with ECLOOP_HASH_UNROLL=0/1.
def _unroll_default() -> bool:
    from .policy import tpu_graph_forms
    return tpu_graph_forms("ECLOOP_HASH_UNROLL")

_U32 = jnp.uint32
M32 = np.uint32(0xFFFFFFFF)

# --- SHA-256 ------------------------------------------------------------------

SHA_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2], dtype=np.uint32)

SHA_IV = np.array([0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                   0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
                  dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def sha256_compress(w16, state=None):
    """One SHA-256 compression: w16 is (..., 16) message words (big-endian
    semantics); returns (..., 8) updated state."""
    if state is None:
        st = None
    else:
        st = [state[..., i] for i in range(8)]
    out = sha256_compress_list([w16[..., i] for i in range(16)], st)
    return jnp.stack(out, axis=-1)


def sha256_compress_list(w, state=None):
    """List-of-word-rows form (limb-first pipeline): w is 16 u32 arrays,
    state 8 arrays or None; returns list of 8 state arrays."""
    if state is None:
        state = [jnp.broadcast_to(jnp.asarray(v), w[0].shape).astype(_U32)
                 for v in SHA_IV]
    w = list(w)
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)

    a, b, c, d, e, f, g, h = state

    if _unroll_default():
        # fully unrolled rounds: a 64-step lax.scan pays per-iteration
        # while-loop latency on a tiny elementwise body; unrolled, the
        # TPU compiler fuses the whole compression into wide VPU kernels.
        a2, b2, c2, d2, e2, f2, g2, h2 = a, b, c, d, e, f, g, h
        for i in range(64):
            ki = np.uint32(SHA_K[i])
            s1 = _rotr(e2, 6) ^ _rotr(e2, 11) ^ _rotr(e2, 25)
            ch = (e2 & f2) ^ (~e2 & g2)
            t1 = h2 + s1 + ch + ki + w[i]
            s0 = _rotr(a2, 2) ^ _rotr(a2, 13) ^ _rotr(a2, 22)
            maj = (a2 & b2) ^ (a2 & c2) ^ (b2 & c2)
            t2 = s0 + maj
            a2, b2, c2, d2, e2, f2, g2, h2 = \
                t1 + t2, a2, b2, c2, d2 + t1, e2, f2, g2
    else:
        ws = jnp.stack(w, axis=0)                      # (64, ...)
        ks = jnp.asarray(SHA_K)

        def round_fn(carry, inp):
            a, b, c, d, e, f, g, h = carry
            wi, ki = inp
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + ki + wi
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            return (t1 + t2, a, b, c, d + t1, e, f, g), None

        (a2, b2, c2, d2, e2, f2, g2, h2), _ = jax.lax.scan(
            round_fn, (a, b, c, d, e, f, g, h), (ws, ks))

    return [a + a2, b + b2, c + c2, d + d2, e + e2, f + f2, g + g2, h + h2]


# --- RIPEMD-160 -----------------------------------------------------------------

# standard RIPEMD-160 schedule/rotation tables (ISO/IEC 10118-3)
_R1 = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
                3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
                1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
                4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13])
_R2 = np.array([5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
                6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
                15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
                8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
                12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11])
_S1 = np.array([11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
                7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
                11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
                11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
                9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6])
_S2 = np.array([8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
                9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
                9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
                15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
                8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11])
_K1 = np.array([0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E],
               dtype=np.uint32)
_K2 = np.array([0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000],
               dtype=np.uint32)
RMD_IV = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0],
                  dtype=np.uint32)


def _rotl(x, n: int):
    """rotate-left by a static amount."""
    return (x << n) | (x >> (32 - n))


def _rotl_v(x, n):
    """rotate-left by a traced vector amount."""
    n = n.astype(_U32)
    return (x << n) | (x >> (np.uint32(32) - n))


def _rmd_group_f(g: int, x, y, z):
    if g == 0:
        return x ^ y ^ z
    if g == 1:
        return (x & y) | (~x & z)
    if g == 2:
        return (x | ~y) ^ z
    if g == 3:
        return (x & z) | (y & ~z)
    return x ^ (y | ~z)


def rmd160_compress(w16):
    """One RIPEMD-160 compression of (..., 16) little-endian message words.
    Returns (..., 5) state words (little-endian semantics)."""
    out = rmd160_compress_list([w16[..., i] for i in range(16)])
    return jnp.stack(out, axis=-1)


def rmd160_compress_list(w):
    """List-of-word-rows form: w is 16 u32 arrays; returns 5 state arrays."""
    h = [jnp.broadcast_to(jnp.asarray(v), w[0].shape).astype(_U32)
         for v in RMD_IV]
    al, bl, cl, dl, el = h
    ar, br, cr, dr, er = h

    if _unroll_default():
        # fully unrolled 80 rounds x 2 lanes (see sha256_compress note):
        # static message-word selection and static rotation amounts let
        # the TPU compiler fuse the whole compression.
        x = list(w)
        for i in range(80):
            g = i // 16
            t = (al + _rmd_group_f(g, bl, cl, dl) + x[_R1[i]]
                 + np.uint32(_K1[g]))
            t = _rotl(t, int(_S1[i])) + el
            al, el, dl, cl, bl = el, dl, _rotl(cl, 10), bl, t
            t = (ar + _rmd_group_f(4 - g, br, cr, dr) + x[_R2[i]]
                 + np.uint32(_K2[g]))
            t = _rotl(t, int(_S2[i])) + er
            ar, er, dr, cr, br = er, dr, _rotl(cr, 10), br, t
    else:
        # scan per 16-round group with dynamic-amount rotations
        for g in range(5):
            sl = slice(16 * g, 16 * g + 16)
            xs_l = jnp.stack([w[i] for i in _R1[sl]], axis=0)
            xs_r = jnp.stack([w[i] for i in _R2[sl]], axis=0)
            ss_l = jnp.asarray(_S1[sl], dtype=np.uint32)
            ss_r = jnp.asarray(_S2[sl], dtype=np.uint32)
            k_l = np.uint32(_K1[g])
            k_r = np.uint32(_K2[g])

            def grp(carry, inp, g=g, k_l=k_l, k_r=k_r):
                al, bl, cl, dl, el, ar, br, cr, dr, er = carry
                xl, xr, sl_, sr_ = inp
                t = al + _rmd_group_f(g, bl, cl, dl) + xl + k_l
                t = _rotl_v(t, jnp.broadcast_to(sl_, t.shape)) + el
                al, el, dl, cl, bl = el, dl, _rotl(cl, 10), bl, t
                t = ar + _rmd_group_f(4 - g, br, cr, dr) + xr + k_r
                t = _rotl_v(t, jnp.broadcast_to(sr_, t.shape)) + er
                ar, er, dr, cr, br = er, dr, _rotl(cr, 10), br, t
                return (al, bl, cl, dl, el, ar, br, cr, dr, er), None

            (al, bl, cl, dl, el, ar, br, cr, dr, er), _ = jax.lax.scan(
                grp, (al, bl, cl, dl, el, ar, br, cr, dr, er),
                (xs_l, xs_r, ss_l, ss_r))

    return [h[1] + cl + dr, h[2] + dl + er, h[3] + el + ar,
            h[4] + al + br, h[0] + bl + cr]


def byteswap32(x):
    return ((x >> 24) | ((x >> 8) & np.uint32(0xFF00))
            | ((x << 8) & np.uint32(0xFF0000)) | (x << 24))


# --- serialization from limb planes ---------------------------------------------

def limbs_to_be_words(a):
    """(..., 16) 16-bit limbs (LE) -> (..., 8) big-endian 32-bit words."""
    idx_hi = np.arange(15, -1, -2)   # limbs 15,13,...,1
    idx_lo = np.arange(14, -1, -2)   # limbs 14,12,...,0
    return ((jnp.take(a, jnp.asarray(idx_hi), axis=-1) << 16)
            | jnp.take(a, jnp.asarray(idx_lo), axis=-1))


def msg33(x_limbs, y_limbs):
    """SHA message block for the compressed pubkey (reference prepare33,
    lib/addr.c:33-45): [02|03][x_be][80 pad][bitlen 264]."""
    xw = limbs_to_be_words(x_limbs)                       # (..., 8)
    prefix = (np.uint32(2) | (y_limbs[..., 0] & 1)) << 24  # 02 or 03
    w0 = prefix | (xw[..., 0] >> 8)
    ws = [w0]
    for i in range(1, 8):
        ws.append((xw[..., i - 1] << 24) | (xw[..., i] >> 8))
    ws.append((xw[..., 7] << 24) | np.uint32(0x00800000))
    zero = jnp.zeros_like(w0)
    ws += [zero] * 6
    ws.append(jnp.full_like(w0, np.uint32(264)))
    return jnp.stack(ws, axis=-1)


def msg65(x_limbs, y_limbs):
    """Two SHA message blocks for the uncompressed pubkey (prepare65,
    lib/addr.c:47-67). Returns ((..., 16), (..., 16))."""
    xw = limbs_to_be_words(x_limbs)
    yw = limbs_to_be_words(y_limbs)
    w0 = np.uint32(0x04 << 24) | (xw[..., 0] >> 8)
    ws = [w0]
    for i in range(1, 8):
        ws.append((xw[..., i - 1] << 24) | (xw[..., i] >> 8))
    ws.append((xw[..., 7] << 24) | (yw[..., 0] >> 8))
    for i in range(1, 8):
        ws.append((yw[..., i - 1] << 24) | (yw[..., i] >> 8))
    blk1 = jnp.stack(ws, axis=-1)

    w16 = (yw[..., 7] << 24) | np.uint32(0x00800000)
    zero = jnp.zeros_like(w0)
    ws2 = [w16] + [zero] * 14 + [jnp.full_like(w0, np.uint32(520))]
    blk2 = jnp.stack(ws2, axis=-1)
    return blk1, blk2


def _sha_to_rmd_msg(sha_state):
    """SHA digest (8 BE-semantic words) -> RMD 16-word LE message with
    padding (0x80, bitlen 256)."""
    le = byteswap32(sha_state)                        # (..., 8)
    w0 = le[..., 0]
    pads = [jnp.full_like(w0, np.uint32(0x80))]
    zero = jnp.zeros_like(w0)
    pads += [zero] * 5
    pads.append(jnp.full_like(w0, np.uint32(256)))
    pads.append(zero)
    return jnp.concatenate([le, jnp.stack(pads, axis=-1)], axis=-1)


def hash160_from_sha(sha_state):
    """(..., 8) SHA state -> (..., 5) hash160 words in print order."""
    st = rmd160_compress(_sha_to_rmd_msg(sha_state))
    return byteswap32(st)


def addr33_hash(x_limbs, y_limbs):
    """hash160 of compressed pubkeys, batched. Output (..., 5) u32 words
    (big-endian print order, == reference h160_t)."""
    return hash160_from_sha(sha256_compress(msg33(x_limbs, y_limbs)))


def addr65_hash(x_limbs, y_limbs):
    """hash160 of uncompressed pubkeys, batched."""
    b1, b2 = msg65(x_limbs, y_limbs)
    st = sha256_compress(b1)
    st = sha256_compress(b2, state=st)
    return hash160_from_sha(st)


# --- limb-first (rows) pipeline ---------------------------------------------------
# Counterparts of msg33/msg65/addr*_hash for the production layout: a
# point is a tuple of 16 uint32 limb rows (fel.py); hash160 output is a
# list of 5 u32 word rows in big-endian print order.  No (..., K)-minor
# arrays ever materialize, so every op runs at full VPU lane width.

def rows_to_be_words(rows):
    """16 LE 16-bit limb rows -> 8 big-endian u32 word rows."""
    return [(rows[15 - 2 * i] << 16) | rows[14 - 2 * i] for i in range(8)]


def msg33_rows(x_rows, y_rows):
    xw = rows_to_be_words(x_rows)
    prefix = (np.uint32(2) | (y_rows[0] & 1)) << 24
    ws = [prefix | (xw[0] >> 8)]
    for i in range(1, 8):
        ws.append((xw[i - 1] << 24) | (xw[i] >> 8))
    ws.append((xw[7] << 24) | np.uint32(0x00800000))
    zero = jnp.zeros_like(ws[0])
    ws += [zero] * 6
    ws.append(jnp.full_like(ws[0], np.uint32(264)))
    return ws


def msg65_rows(x_rows, y_rows):
    xw = rows_to_be_words(x_rows)
    yw = rows_to_be_words(y_rows)
    ws = [np.uint32(0x04 << 24) | (xw[0] >> 8)]
    for i in range(1, 8):
        ws.append((xw[i - 1] << 24) | (xw[i] >> 8))
    ws.append((xw[7] << 24) | (yw[0] >> 8))
    for i in range(1, 8):
        ws.append((yw[i - 1] << 24) | (yw[i] >> 8))
    blk1 = ws
    w16 = (yw[7] << 24) | np.uint32(0x00800000)
    zero = jnp.zeros_like(w16)
    blk2 = [w16] + [zero] * 14 + [jnp.full_like(w16, np.uint32(520))]
    return blk1, blk2


def _sha_rows_to_rmd_msg(st):
    le = [byteswap32(s) for s in st]
    zero = jnp.zeros_like(le[0])
    return le + [jnp.full_like(le[0], np.uint32(0x80)),
                 zero, zero, zero, zero, zero,
                 jnp.full_like(le[0], np.uint32(256)), zero]


def hash160_rows_from_sha(st):
    rmd = rmd160_compress_list(_sha_rows_to_rmd_msg(st))
    return [byteswap32(v) for v in rmd]


def addr33_hash_rows(x_rows, y_rows):
    """hash160 of compressed pubkeys from limb rows -> 5 u32 word rows."""
    return hash160_rows_from_sha(sha256_compress_list(msg33_rows(
        x_rows, y_rows)))


def addr65_hash_rows(x_rows, y_rows):
    b1, b2 = msg65_rows(x_rows, y_rows)
    st = sha256_compress_list(b1)
    st = sha256_compress_list(b2, st)
    return hash160_rows_from_sha(st)


# --- host helpers -----------------------------------------------------------------

def h160_to_hex(words) -> list[str]:
    """(..., 5) u32 -> hex strings."""
    w = np.asarray(words).reshape(-1, 5)
    return ["".join(f"{int(v):08x}" for v in row) for row in w]


def hex_to_h160(hexstr: str) -> np.ndarray:
    return np.array([int(hexstr[i:i + 8], 16) for i in range(0, 40, 8)],
                    dtype=np.uint32)
