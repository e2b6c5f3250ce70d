"""`mul` mode: windowed precomputed-G-table scalar multiplication over
arbitrary private keys (stdin lists).

TPU re-architecture of the reference's gtable path (SURVEY.md §3.2;
reference ec_gtable_init/ec_gtable_mul + cmd_mul, lib/ecc.c:874-929,
main.c:456-576):

  * Same windowed-table math: d = ceil(255/w) windows of w bits; row i of
    the table holds j * 2^(w*i) * G for j in 1..2^w-1; a scalar mul is
    <=d table gathers + <=d-1 point additions, zero doublings.
  * The table is built **batched on device**: the d row bases come from
    one batched double-and-add, then all rows grow in lockstep through
    log2(2^w-1) doubling rounds of batch-affine adds — instead of the
    reference's 311k sequential adds.
  * Window extraction happens on host (keys are host-parsed anyway);
    the device receives (B, d) gather indices, accumulates through a
    lax.scan over windows with complete projective adds (infinity-aware
    selects replace the reference's q.x==0 sentinel), batch-reduces to
    affine, hashes, and bloom-probes — one jit call per job.
  * Found keys are confirmed host-side against exact filter semantics
    (the reference skips pk re-verification in mul mode, main.c:469-474;
    we keep the exact-membership check, which is what determines the
    found set).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from .. import ecc, fe, golden, hash160
from ..filters import Filter
from .common import Found, SearchConfig
from .add import _pack_mask, unpack_mask

N = golden.N


@functools.lru_cache(maxsize=2)
def build_gtable(w: int = 14, lanes: int = 1024, how: str = "auto"):
    """Build the device gtable. Returns (tx, ty) of shape (d*(2^w-1), 16)
    with flat layout index = (2^w - 1) * window + (digit - 1)."""
    n = 1 << w
    d = (255 // w) + 1
    if how == "auto":
        how = "host" if d * (n - 1) <= 4096 else "device"
    if how == "host":
        pts = [golden.point_mul((j * pow(2, w * i, N)) % N)
               for i in range(d) for j in range(1, n)]
        return (jnp.asarray(fe.ints_to_limbs([p[0] for p in pts])),
                jnp.asarray(fe.ints_to_limbs([p[1] for p in pts])))
    # row bases: 2^(w*i) * G via one batched double-and-add
    base_scalars = [pow(2, w * i, N) for i in range(d)]
    kl = jnp.asarray(fe.ints_to_limbs(base_scalars))
    x, y, z = jax.jit(ecc.scalar_mul)(kl)
    bx, by = jax.jit(ecc.proj_to_affine, static_argnames="lanes")(
        x, y, z, lanes=min(lanes, d))

    # grow all rows in lockstep: have multiples [1..m] of every base,
    # produce [m+1..2m] = m*b + [1..m] (j == m handled as doubling)
    add = jax.jit(ecc.batch_add_or_dbl, static_argnames="lanes")
    rows_x = [bx]   # rows_x[j-1] : (d, 16) = j * base
    rows_y = [by]
    m = 1
    while m < n - 1:
        take = min(m, n - 1 - m)
        px = jnp.broadcast_to(rows_x[m - 1][None], (take, d, 16)).reshape(-1, 16)
        py = jnp.broadcast_to(rows_y[m - 1][None], (take, d, 16)).reshape(-1, 16)
        qx = jnp.stack(rows_x[:take], axis=0).reshape(-1, 16)
        qy = jnp.stack(rows_y[:take], axis=0).reshape(-1, 16)
        nx, ny = add(px, py, qx, qy, lanes=min(lanes, take * d))
        nx = nx.reshape(take, d, 16)
        ny = ny.reshape(take, d, 16)
        for t in range(take):
            rows_x.append(nx[t])
            rows_y.append(ny[t])
        m += take

    # flat layout: index = (n-1)*window + digit-1  -> stack as (n-1, d) then
    # transpose to (d, n-1)
    tx = jnp.stack(rows_x, axis=0).transpose(1, 0, 2).reshape(-1, 16)
    ty = jnp.stack(rows_y, axis=0).transpose(1, 0, 2).reshape(-1, 16)
    return jax.device_put(tx), jax.device_put(ty)


def window_indices(keys: list[int], w: int) -> np.ndarray:
    """(B, d) int32 flat gather indices; -1 marks a zero digit (skip)."""
    n = 1 << w
    d = (255 // w) + 1
    out = np.full((len(keys), d), -1, dtype=np.int32)
    for r, k in enumerate(keys):
        for i in range(d):
            digit = (k >> (w * i)) & (n - 1)
            if digit:
                out[r, i] = (n - 1) * i + digit - 1
    return out


def parse_keys(lines: list[str], raw: bool) -> list[int]:
    """Hex private keys, or -raw: SHA-256 of the line bytes
    (reference main.c:503-527)."""
    if raw:
        return [int.from_bytes(hashlib.sha256(ln.encode()).digest(), "big")
                for ln in lines]
    return [int(ln, 16) % N for ln in lines]


def build_mul_step(cfg: SearchConfig, filt: Filter, w: int, batch: int):
    """Jitted: (idx (d, B), tx, ty, bits) -> masks (V, B/32)."""
    d = (255 // w) + 1

    def step(idx, tx, ty, bits):
        def body(carry, idx_i):
            qx, qy, qz = carry
            gx = jnp.take(tx, jnp.maximum(idx_i, 0), axis=0)
            gy = jnp.take(ty, jnp.maximum(idx_i, 0), axis=0)
            nx, ny, nz = ecc.proj_add_affine(qx, qy, qz, gx, gy)
            skip = idx_i < 0
            qx = fe.select(skip, qx, nx)
            qy = fe.select(skip, qy, ny)
            qz = fe.select(skip, qz, nz)
            return (qx, qy, qz), None

        zeros = jnp.zeros((idx.shape[1], 16), dtype=jnp.uint32)
        q0 = ecc.proj_infinity(zeros)
        (qx, qy, qz), _ = jax.lax.scan(body, q0, idx)
        ax, ay = ecc.proj_to_affine(qx, qy, qz, lanes=min(cfg.lanes, batch))

        masks = []
        if cfg.addr33:
            masks.append(_pack_mask(filt.device_probe(
                hash160.addr33_hash(ax, ay))))
        if cfg.addr65:
            masks.append(_pack_mask(filt.device_probe(
                hash160.addr65_hash(ax, ay))))
        return jnp.stack(masks, axis=0)

    return jax.jit(step)


class MulSearch:
    """Key-list search engine (reference cmd_mul).

    Jobs of `batch` keys at a time; the host is the producer (the
    reference's stdin->queue->workers pipeline becomes host-parse ->
    async device dispatch, with JAX's async dispatch providing the
    overlap the reference gets from its blocking queue)."""

    def __init__(self, cfg: SearchConfig, filt: Filter, w: int = 14,
                 batch: int = 2048, raw: bool = False, init: str = "auto"):
        self.cfg = cfg
        self.filt = filt
        self.w = w
        self.batch = batch
        self.raw = raw
        self.tx, self.ty = build_gtable(w, cfg.lanes, init)
        self.bits = jnp.asarray(filt.device_bits)
        self.step_fn = build_mul_step(cfg, filt, w, batch)
        self.k_checked = 0
        self.k_found = 0

    def run_keys(self, keys: list[int], on_found=None) -> list[Found]:
        found = []
        for off in range(0, len(keys), self.batch):
            job = keys[off:off + self.batch]
            idx = window_indices(job, self.w)
            pad = self.batch - len(job)
            if pad:
                idx = np.concatenate(
                    [idx, np.full((pad, idx.shape[1]), -1, np.int32)], axis=0)
            masks = self.step_fn(jnp.asarray(idx.T), self.tx, self.ty,
                                 self.bits)
            found.extend(self._handle_hits(job, np.asarray(masks), on_found))
            self.k_checked += len(job)
        return found

    def run_lines(self, lines, on_found=None) -> list[Found]:
        lines = [ln.rstrip("\r\n") for ln in lines]
        lines = [ln for ln in lines if ln]
        keys = parse_keys(lines, self.raw)
        return self.run_keys(keys, on_found=on_found)

    def _handle_hits(self, job, masks_np, on_found) -> list[Found]:
        out = []
        labels = ([("addr33", True)] if self.cfg.addr33 else []) + \
                 ([("addr65", False)] if self.cfg.addr65 else [])
        for v, (label, is33) in enumerate(labels):
            idxs = np.nonzero(unpack_mask(masks_np[v]))[0]
            for j in idxs:
                if j >= len(job):
                    continue  # padding lane
                priv = job[int(j)]
                pt = golden.point_mul(priv)
                h = (golden.addr33(pt) if is33 else golden.addr65(pt)).hex()
                if not self.filt.confirm(bytes.fromhex(h)):
                    continue
                f = Found(label=label, h160=h, priv=priv)
                out.append(f)
                self.k_found += 1
                if on_found:
                    on_found(f)
        return out
