"""`rnd` mode: repeated add-search over randomized bit-window sub-ranges.

Reference semantics (SURVEY.md §3.3; main.c:580-662, 703-746):
  * pick a random base in [range_s, range_e] (rejection-sampled),
  * zero the `size` bits at offset `offs` for the sub-range start, set
    them for the sub-range end, clamp into the outer range,
  * run the full add machinery over the sub-range, repeat forever
    (single pass if the window covers the whole range).

RNG parity note: the reference's `-seed` path uses libc rand(); a libc-
bit-exact PRNG is neither portable nor meaningful on TPU, so seeded runs
here use Python's Mersenne twister seeded with the same string-hash
(encode_seed, utils.c:107-115).  Unseeded runs use os.urandom, like the
reference's /dev/urandom path.  Found-set semantics per sub-range are
identical; only the sub-range visit order differs for seeded runs
(documented divergence, SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import os
import random

from .. import golden
from ..filters import Filter
from .add import AddSearch
from .common import Found, SearchConfig
from . import common


def encode_seed(seed: str) -> int:
    """String-hash seeding, parity with reference encode_seed
    (utils.c:107-115): h = h*31 + ch over the bytes, mod 2^32."""
    h = 0
    for ch in seed.encode():
        h = ((h << 5) - h + ch) & 0xFFFFFFFF
    return h


class Rng:
    """rand64 / range sampling with the reference's two sources:
    seeded PRNG or OS entropy."""

    def __init__(self, seed: str | None):
        self.seeded = seed is not None
        self._r = random.Random(encode_seed(seed)) if self.seeded else None

    def rand64(self) -> int:
        if self.seeded:
            return self._r.getrandbits(64)
        return int.from_bytes(os.urandom(8), "little")

    def fe_rand(self) -> int:
        """256-bit sample with the top limb masked to < P
        (fe_prand/fe_urand, utils.c:117-127)."""
        v = 0
        for i in range(4):
            v |= self.rand64() << (64 * i)
        return v & ((0xFFFFFFFEFFFFFC2F << 192) | (1 << 192) - 1)

    def rand_range(self, a: int, b: int) -> int:
        """Rejection sampling of [a, b] (fe_rand_range, utils.c:129-153)."""
        rng_size = b - a + 1
        bits = rng_size.bit_length()
        while True:
            x = self.fe_rand() & ((1 << bits) - 1)
            if x < rng_size:
                return a + x


def default_offs_size(range_e: int, offs: int | None, size: int | None,
                      rng: Rng, is_rnd: bool) -> tuple[int, int]:
    """-d defaulting and clamping (load_offs_size, main.c:703-746)."""
    MIN_SIZE, MAX_SIZE = 20, 64
    range_bits = range_e.bit_length()
    default_bits = max(MIN_SIZE, range_bits) if range_bits < 32 else 32
    max_offs = max(1, max(MIN_SIZE, range_bits) - default_bits)

    if offs is None and size is None:
        if is_rnd:
            return rng.rand64() % max_offs, default_bits
        return 0, default_bits
    offs = offs or 0
    size = size if size is not None else default_bits
    if offs > 255:
        raise ValueError("invalid offset, max is 255")
    if not (MIN_SIZE <= size <= MAX_SIZE):
        raise ValueError(f"invalid size, min is {MIN_SIZE} and max is {MAX_SIZE}")
    return min(max_offs, offs), size


def gen_random_range(rng: Rng, a: int, b: int, offs: int,
                     size: int) -> tuple[int, int]:
    """One random sub-range (gen_random_range, main.c:580-591)."""
    base = rng.rand_range(a, b)
    window = ((1 << size) - 1) << offs
    lo = base & ~window
    hi = base | window
    return max(lo, a), min(hi, b)


def format_range_mask(value: int, offs: int, size: int,
                      color: bool) -> str:
    """64-nibble visualization with the dynamic window highlighted
    (print_range_mask, main.c:593-617)."""
    mask_e = 255 - offs
    mask_s = mask_e - size + 1
    out = []
    for i in range(64):
        if i % 16 == 0 and i != 0:
            out.append(" ")
        bit_s, bit_e = i * 4, i * 4 + 3
        cc = "0123456789abcdef"[(value >> (255 - bit_e)) & 0xF]
        hot = (mask_s <= bit_s <= mask_e) or (mask_s <= bit_e <= mask_e)
        if hot and color:
            out.append(f"\033[33m{cc}\033[0m")
        else:
            out.append(cc)
    return "".join(out)


class RndSearch:
    """Randomized-window search driver (reference cmd_rnd).

    Multi-chip: pass a mesh and every random sub-range is searched by
    the full ShardedAddSearch machinery — the TPU analog of the
    reference spawning its whole worker pool per sub-range
    (main.c:645-651)."""

    def __init__(self, cfg: SearchConfig, filt: Filter,
                 seed: str | None = None, offs: int | None = None,
                 size: int | None = None, mesh=None):
        self.cfg = cfg
        self.filt = filt
        self.rng = Rng(seed)
        self.offs, self.size = default_offs_size(
            cfg.range_e, offs, size, self.rng, is_rnd=True)
        self.offs = min(self.offs, 255 - self.size)   # main.c:620
        if mesh is not None:
            from ..parallel.mesh import ShardedAddSearch
            self.engine = ShardedAddSearch(cfg, filt, mesh)
        else:
            self.engine = AddSearch(cfg, filt)

    def run(self, max_iters: int | None = None, on_found=None,
            on_iter=None, on_range=None, skip_iters: int = 0) -> list[Found]:
        """skip_iters: draw (and discard) the first N sub-ranges without
        searching them — the checkpoint-resume cursor for seeded runs
        (the RNG sequence is deterministic, so position = iteration
        count).  on_iter(i, lo, hi, got) fires after each searched
        sub-range with the cumulative iteration number."""
        found = []
        iters = 0
        while True:
            lo, hi = gen_random_range(self.rng, self.cfg.range_s,
                                      self.cfg.range_e, self.offs, self.size)
            is_full = (lo == self.cfg.range_s and hi == self.cfg.range_e)
            if iters < skip_iters:
                iters += 1
                if is_full:
                    return found   # single-pass search already completed
                continue
            if on_range:
                on_range(lo, hi)   # mask print happens BEFORE the search
            # per-iteration bounds go through run_range's range override
            # (the engine's compiled step graph and tables are range-
            # independent, so one engine serves every sub-range)
            got = self.engine.run_range(on_found=on_found,
                                        range_s=lo, range_e=hi)
            found.extend(got)
            iters += 1
            if on_iter:
                on_iter(iters, lo, hi, got)
            if is_full or (max_iters is not None and iters >= max_iters):
                return found
