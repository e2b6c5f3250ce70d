"""Bloom filter: ECBF-v1 file format, host build, and on-device probe.

Reference semantics (/root/reference/lib/utils.c:272-475):
  * k = 20 probes derived arithmetic-only from the 5 hash words:
    five overlapping u64s x four shift constants {24, 28, 36, 40}
  * bit index = idx mod (size * 64) over a u64[size] bit array
  * file format: magic 'ECBF' (0x45434246 LE), version 1, u64 size,
    then size x u64 little-endian words
  * blf-gen sizing: m = n * ln(1e-9) / ln(1 / 2^ln2) bits

TPU re-design: the probe runs on device over a HBM-resident uint32 view of
the bit array.  The TPU has no native u64, so the u64 index arithmetic is
expressed as (hi, lo) u32 pairs and the `mod M` (M = size*64, *not* a power
of two) is a Barrett reduction in 16-bit limbs — exact for any M <= 2^37
(16 GB of filter bits, beyond a v5e's HBM).

For `-f <hash list>` mode the device filter does not need reference bit
layout (the exact check is against the sorted list); we use a power-of-two
sized variant whose `mod` is a mask — cheaper and fp-tunable.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import jax
import jax.numpy as jnp

BLF_MAGIC = 0x45434246
BLF_VERSION = 1

_SHIFTS = (24, 28, 36, 40)


# --- host-side (numpy, exact reference semantics) ------------------------------

def _h160_to_a5(h: np.ndarray) -> list[np.ndarray]:
    """(..., 5) u32 -> the five overlapping u64s (numpy, vectorized)."""
    h = h.astype(np.uint64)
    return [
        (h[..., 0] << np.uint64(32)) | h[..., 1],
        (h[..., 2] << np.uint64(32)) | h[..., 3],
        (h[..., 4] << np.uint64(32)) | h[..., 0],
        (h[..., 1] << np.uint64(32)) | h[..., 2],
        (h[..., 3] << np.uint64(32)) | h[..., 4],
    ]


def probe_indices_host(h: np.ndarray) -> np.ndarray:
    """(..., 5) u32 hash words -> (..., 20) u64 probe indices (pre-mod)."""
    a = _h160_to_a5(h)
    out = []
    for s in _SHIFTS:
        s = np.uint64(s)
        for i in range(5):
            out.append((a[i] << s) | (a[(i + 1) % 5] >> s))
    return np.stack(out, axis=-1)


class BloomFilter:
    """Exact reference-compatible bloom filter (host side)."""

    def __init__(self, size_words: int, bits: np.ndarray | None = None):
        self.size = int(size_words)            # number of u64 words
        self.bits = (np.zeros(self.size, dtype=np.uint64)
                     if bits is None else bits)
        assert self.bits.shape == (self.size,)

    @classmethod
    def for_count(cls, n: int) -> "BloomFilter":
        """blf-gen sizing: p = 1e-9 (utils.c:423-425)."""
        p = 1.0 / 1e9
        m = int(n * math.log(p) / math.log(1.0 / math.pow(2.0, math.log(2.0))))
        return cls((m + 63) // 64)

    @property
    def nbits(self) -> int:
        return self.size * 64

    def add_many(self, hashes: np.ndarray) -> None:
        from . import native
        if native.available() and hashes.ndim == 2:
            native.bloom_add(self.bits, hashes)
            return
        idx = probe_indices_host(hashes).reshape(-1) % np.uint64(self.nbits)
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def has_many(self, hashes: np.ndarray) -> np.ndarray:
        """(..., 5) -> (...,) bool, all-20-probes membership."""
        from . import native
        if native.available() and hashes.ndim == 2:
            return native.bloom_has(self.bits, hashes)
        idx = probe_indices_host(hashes) % np.uint64(self.nbits)
        words = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
        return np.all(hit == 1, axis=-1)

    # --- ECBF v1 file format ---
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(struct.pack("<IIQ", BLF_MAGIC, BLF_VERSION, self.size))
            f.write(self.bits.astype("<u8").tobytes())

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        with open(path, "rb") as f:
            magic, version, size = struct.unpack("<IIQ", f.read(16))
            if magic != BLF_MAGIC or version != BLF_VERSION:
                raise ValueError(
                    "invalid bloom filter version; create a new filter with "
                    "blf-gen command")
            bits = np.frombuffer(f.read(size * 8), dtype="<u8").copy()
        if bits.size != size:
            raise ValueError("failed to read bloom filter bits")
        return cls(size, bits)

    def as_u32(self) -> np.ndarray:
        """Little-endian u32 view for the device probe."""
        return self.bits.view("<u4").copy()


# --- device-side probe ----------------------------------------------------------

def _probe_pairs(h):
    """Hash words ((..., 5) array or list of 5 rows) -> 20 (hi, lo) u32
    index pairs."""
    if not isinstance(h, (list, tuple)):
        h = [h[..., i] for i in range(5)]
    a = [(h[0], h[1]), (h[2], h[3]), (h[4], h[0]),
         (h[1], h[2]), (h[3], h[4])]
    out = []
    for s in _SHIFTS:
        for i in range(5):
            ah, al = a[i]
            bh, bl = a[(i + 1) % 5]
            if s < 32:
                hi = (ah << s) | (al >> (32 - s)) | (bh >> s)
                lo = (al << s) | (bl >> s) | (bh << (32 - s))
            else:
                t = s - 32
                hi = (al << t) if t else al
                lo = bh >> t if t else bh
            out.append((hi, lo))
    return out


def _barrett_mod(hi, lo, m: int):
    """(hi, lo) u64 value mod constant M, exactly, in u32 ops.

    Returns (word32_idx, bit5): bit position p = x mod M as the u32-word
    index p >> 5 and bit p & 31.  Requires 64 <= M <= 2^37, M % 64 == 0.
    """
    assert 64 <= m <= (1 << 37) and m % 64 == 0
    mask16 = np.uint32(0xFFFF)
    x = [lo & mask16, lo >> 16, hi & mask16, hi >> 16]
    mu = (1 << 80) // m
    mu_l = [(mu >> (16 * i)) & 0xFFFF for i in range((mu.bit_length() + 15) // 16)]
    m_l = [(m >> (16 * i)) & 0xFFFF for i in range(3)]

    # q = floor(x * mu / 2^80): accumulate product columns 4..8 (16-bit limbs
    # 5..8 of the product plus column 4 for the carry into limb 5)
    ncols = len(mu_l) + 4
    cols = [None] * ncols
    for i in range(4):
        for j, muj in enumerate(mu_l):
            pr = x[i] * np.uint32(muj)
            k = i + j
            plo, phi = pr & mask16, pr >> 16
            cols[k] = plo if cols[k] is None else cols[k] + plo
            if k + 1 < ncols:
                cols[k + 1] = phi if cols[k + 1] is None else cols[k + 1] + phi
    zero = jnp.zeros_like(hi)
    cols = [zero if c is None else c for c in cols]
    # carry-normalize from column 3 upward (lower columns only feed carries;
    # their worst-case contribution is bounded by +1 into column 4 which the
    # mu construction already absorbs via the error margin of Barrett)
    c = zero
    norm = []
    for k in range(ncols):
        v = cols[k] + c
        norm.append(v & mask16)
        c = v >> 16
    norm.append(c)
    q = norm[5:9] + [zero] * max(0, 9 - len(norm))   # limbs of q (<= 2^58)
    q = (q + [zero] * 4)[:4]

    # r = x - q*M (low 4 limbs, wraps correctly since 0 <= r_true < 2^40)
    qm_cols = [zero] * 5
    for i in range(4):
        for j, mj in enumerate(m_l):
            if mj == 0 or i + j >= 5:
                continue
            pr = q[i] * np.uint32(mj)
            qm_cols[i + j] = qm_cols[i + j] + (pr & mask16)
            if i + j + 1 < 5:
                qm_cols[i + j + 1] = qm_cols[i + j + 1] + (pr >> 16)
    c = zero
    qm = []
    for k in range(4):
        v = qm_cols[k] + c
        qm.append(v & mask16)
        c = v >> 16

    r = []
    borrow = zero
    for i in range(4):
        d = x[i] - qm[i] - borrow
        r.append(d & mask16)
        borrow = (x[i] < qm[i] + borrow).astype(jnp.uint32)

    # up to 3 conditional subtracts of M
    for _ in range(3):
        d = []
        borrow = zero
        for i in range(4):
            mi = np.uint32(m_l[i]) if i < 3 else np.uint32(0)
            di = r[i] - mi - borrow
            d.append(di & mask16)
            borrow = (r[i] < mi + borrow).astype(jnp.uint32)
        r = [jnp.where(borrow == 0, d[i], r[i]) for i in range(4)]

    word32 = (r[0] >> 5) | (r[1] << 11) | (r[2] << 27)
    bit5 = r[0] & np.uint32(31)
    return word32, bit5


def probe_exact(h_words, bits_u32, nbits: int, nprobes: int = 20):
    """Exact reference bloom membership on device.

    h_words: (..., 5) u32; bits_u32: (W,) u32 (LE view of the u64 array);
    nbits: size*64 (static).  Returns (...,) bool.

    nprobes < 20 evaluates only the first nprobes of the 20 reference
    probe indices — a device-side prefilter (each Barrett-mod probe costs
    ~a hundred VPU ops plus a gather, so 20 probes rival the whole hash
    pipeline).  Callers using it MUST re-check survivors against all 20
    probes on host (`BloomFilter.has_many`) to keep the reference's
    found-set semantics bit-exact.
    """
    hit = None
    for hi, lo in _probe_pairs(h_words)[:nprobes]:
        w32, b5 = _barrett_mod(hi, lo, nbits)
        word = jnp.take(bits_u32, w32.astype(jnp.int32), axis=0)
        bit = (word >> b5) & 1
        hit = bit if hit is None else (hit & bit)
    return hit == 1


def adaptive_probe_count(bits: np.ndarray, target_fp: float = 1e-6) -> int:
    """Smallest device-probe count whose estimated false-positive rate is
    <= target_fp given the filter's measured fill ratio (fp ~= fill^k).
    The host confirm absorbs the (rare) extra survivors, so this choice
    affects throughput only, never the found set."""
    nbits = bits.size * 64
    # popcount without np.bitwise_count (NumPy >= 2.0 only); a 256-entry
    # LUT over the u8 view keeps the temporary the same size as the
    # filter (np.unpackbits would materialize 8x the filter — 4 GiB for
    # a 512 MiB .blf)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.uint32)
    ones = int(lut[np.ascontiguousarray(bits).view(np.uint8)].sum(
        dtype=np.uint64))
    fill = ones / max(nbits, 1)
    if fill <= 0.0:
        return 1
    if fill >= 1.0:
        return 20
    k = math.ceil(math.log(target_fp) / math.log(fill))
    return max(1, min(20, k))


def probe_pow2(h_words, bits_u32, log2_bits: int, nprobes: int = 2):
    """Fast prefilter probe: same index derivation, mod 2^log2_bits via mask.
    Used for hash-list mode where the exact check is the sorted list."""
    mask_lo = np.uint32((1 << min(log2_bits, 32)) - 1 if log2_bits < 32
                        else 0xFFFFFFFF)
    hit = None
    for hi, lo in _probe_pairs(h_words)[:nprobes]:
        if log2_bits <= 32:
            p = lo & mask_lo
            w32 = p >> 5
        else:
            hmask = np.uint32((1 << (log2_bits - 32)) - 1)
            w32 = ((hi & hmask) << 27) | (lo >> 5)
        word = jnp.take(bits_u32, w32.astype(jnp.int32), axis=0)
        bit = (word >> (lo & np.uint32(31))) & 1
        hit = bit if hit is None else (hit & bit)
    return hit == 1


def build_pow2(hashes: np.ndarray, log2_bits: int | None = None,
               nprobes: int = 2) -> tuple[np.ndarray, int]:
    """Host-build the power-of-two prefilter over target hashes.
    Returns (bits_u32, log2_bits)."""
    n = max(1, len(hashes))
    if log2_bits is None:
        # ~64 bits/key => fp ~ (k n / m)^k tiny; floor at 2^16 bits
        log2_bits = max(16, (n * 64 - 1).bit_length())
    log2_bits = min(log2_bits, 37)
    nbits = 1 << log2_bits
    bits = np.zeros(nbits // 32, dtype=np.uint32)
    if len(hashes):
        idx = probe_indices_host(hashes)[..., :nprobes].reshape(-1)
        idx &= np.uint64(nbits - 1)
        np.bitwise_or.at(bits, (idx >> np.uint64(5)).astype(np.int64),
                         np.uint32(1) << (idx & np.uint64(31)).astype(np.uint32))
    return bits, log2_bits
