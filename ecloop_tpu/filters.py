"""Target-filter loading and the two-tier check used by all search modes.

Mirrors the reference's semantics (/root/reference/main.c:71-131, 205-217):

  * `-f file.blf`      -> bloom-only mode: membership IS the bloom probe
                          (false positives included in the found set).
  * `-f hash-list.txt` -> exact mode: 40-hex-char lines, sorted + deduped;
                          bloom is only an accelerator.

TPU re-design: the device runs a cheap prefilter (exact ECBF probe for
.blf mode, power-of-two masked probe for list mode) over every candidate
hash; the host confirms rare prefilter hits with exact semantics and a
full golden re-derivation (keeping the reference's built-in verification,
main.c:248-263).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from . import bloom, native


@dataclasses.dataclass
class Filter:
    mode: str                         # "list" | "bloom"
    targets: np.ndarray | None        # sorted unique (N, 5) u32, list mode
    blf: bloom.BloomFilter | None     # exact bloom (bloom mode)
    device_bits: np.ndarray           # u32 bit array for the device probe
    pow2_log2: int | None             # set in list mode
    # TPU gathers are the probe's cost; 2 probes at ~0.25% fill give
    # ~1e-5 false-positive/key — the host exact check absorbs those
    pow2_probes: int = 2
    # bloom mode: device probes actually evaluated (adaptive prefilter;
    # host confirm re-checks all 20, so the found set never changes)
    blf_probes: int = 20

    @property
    def count(self) -> int:
        return 0 if self.targets is None else len(self.targets)

    # --- device side ---
    def device_probe(self, h_words):
        """jnp (..., 5) hash words -> (...,) bool candidate mask.
        Must be called under jit with self captured statically."""
        bits = jnp.asarray(self.device_bits)
        if self.mode == "bloom":
            return bloom.probe_exact(h_words, bits, nbits=self.blf.nbits,
                                     nprobes=self.blf_probes)
        if self._use_cmp():
            # small target lists: broadcast-compare the first hash word
            # against every target's first word.  TPU gathers cost ~7+
            # cycles/element while a K-wide vector compare streams at
            # VPU rate, so for K <= ~1k this beats the 2-probe pow2
            # bloom AND has a lower false-positive rate (K/2^32 per key
            # vs ~1e-5); the host exact check absorbs both kinds.
            h0 = (h_words[0] if isinstance(h_words, (list, tuple))
                  else h_words[..., 0])
            t0 = jnp.asarray(np.unique(self.targets[:, 0]))
            return (h0[..., None] == t0).any(axis=-1)
        return bloom.probe_pow2(h_words, bits, log2_bits=self.pow2_log2,
                                nprobes=self.pow2_probes)

    def _use_cmp(self) -> bool:
        import os
        if self.mode != "list":
            return False
        mx = int(os.environ.get("ECLOOP_CMP_MAX", 2048))
        return len(self.targets) <= mx

    # --- host side (authoritative) ---
    def confirm(self, h160_bytes: bytes) -> bool:
        """Exact membership semantics of ctx_check_hash (main.c:205-217)."""
        h = np.frombuffer(h160_bytes, dtype=">u4").astype(np.uint32)
        if self.mode == "bloom":
            return bool(self.blf.has_many(h[None])[0])
        if native.available():
            return native.list_search(self.targets, h) >= 0
        idx = np.searchsorted(self._keys, _h160_key(h))
        return bool(idx < len(self._keys) and self._keys[idx] == _h160_key(h))

    def __post_init__(self):
        if self.targets is not None:
            self._keys = _h160_keys(self.targets)
        else:
            self._keys = None


def _h160_key(h: np.ndarray) -> int:
    """5xu32 -> int for lexicographic comparison (compare_160 order)."""
    v = 0
    for w in h:
        v = (v << 32) | int(w)
    return v


def _h160_keys(hs: np.ndarray) -> np.ndarray:
    """(N, 5) -> sorted object array of ints (exact, no collision)."""
    return np.array(sorted(_h160_key(h) for h in hs), dtype=object)


def parse_hash_lines(text: str) -> np.ndarray:
    """Parse 40-hex-char lines into (N, 5) u32; skip malformed lines
    (reference skips lines whose length != 40, main.c:97-98)."""
    rows = []
    for ln in text.splitlines():
        ln = ln.strip()
        if len(ln) != 40:
            continue
        try:
            rows.append([int(ln[i:i + 8], 16) for i in range(0, 40, 8)])
        except ValueError:
            continue
    return np.array(rows, dtype=np.uint32).reshape(-1, 5)


def load_filter(path: str) -> Filter:
    if path.endswith(".blf"):
        import os
        blf = bloom.BloomFilter.load(path)
        env = os.environ.get("ECLOOP_BLF_PROBES")
        nprobes = (int(env) if env
                   else bloom.adaptive_probe_count(blf.bits))
        return Filter(mode="bloom", targets=None, blf=blf,
                      device_bits=blf.as_u32(), pow2_log2=None,
                      blf_probes=max(1, min(20, nprobes)))

    with open(path) as f:
        hashes = parse_hash_lines(f.read())
    if len(hashes) == 0:
        raise ValueError(f"no hash160 entries found in {path}")
    # sort + dedupe (reference main.c:113-125)
    order = np.lexsort(tuple(hashes[:, i] for i in range(4, -1, -1)))
    hashes = hashes[order]
    keep = np.ones(len(hashes), dtype=bool)
    keep[1:] = (hashes[1:] != hashes[:-1]).any(axis=1)
    hashes = hashes[keep]

    bits, log2b = bloom.build_pow2(hashes)
    return Filter(mode="list", targets=hashes, blf=None,
                  device_bits=bits, pow2_log2=log2b)


def filter_from_hashes(hashes: np.ndarray) -> Filter:
    order = np.lexsort(tuple(hashes[:, i] for i in range(4, -1, -1)))
    hashes = np.unique(hashes[order], axis=0)
    bits, log2b = bloom.build_pow2(hashes)
    return Filter(mode="list", targets=hashes, blf=None,
                  device_bits=bits, pow2_log2=log2b)
