"""`add` mode: sequential batch-addition search over a contiguous range.

TPU re-architecture of the reference's flagship path (SURVEY.md §3.1;
reference batch_add/cmd_add, main.c:349-454):

  * The reference walks ONE group center and computes 2048 neighbors via
    precomputed G-multiples, amortizing a single field inversion per group.
    Here, **M centers advance in lockstep**, each with K neighbors from a
    shared table, so one device step covers M*K keys and one *batched*
    Montgomery inversion (vector-lane parallel) serves all of them —
    threads->lanes, mutex cursor->host-planned contiguous spans.
  * The full chain point->serialize->SHA-256->RIPEMD-160->filter-probe
    runs on device; per step the host receives only packed hit masks.
  * Endomorphism expansion (6 candidate pubkeys per EC point) happens on
    device before hashing (reference main.c:300-346).
  * Hits are re-derived and verified on host from scratch (the reference's
    pk_verify_hash oracle is kept in-path, main.c:248-263).

Key layout per step t (stride s = 2^offs, h = K/2):
  flat index j = m*K + i  ->  private key  base + (t*M*K + j) * s
  lane (m, i) point       =  C_m + (i - h) * s * G,   C_m advancing by MKs*G
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import ecc, fe, golden, hash160
from ..filters import Filter
from . import common
from .common import Claim, Found, SearchConfig

N = golden.N


def _variants(cfg: SearchConfig) -> list[tuple[int, bool]]:
    """Static candidate-variant list: (endo_idx, is_addr33)."""
    endos = range(6) if cfg.endo else range(1)
    out = []
    for e in endos:
        if cfg.addr33:
            out.append((e, True))
        if cfg.addr65:
            out.append((e, False))
    return out


def _pack_mask(bits):
    """(B,) bool -> (B//32,) u32, little-endian bit order."""
    b = bits.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_mask(words: np.ndarray) -> np.ndarray:
    return np.unpackbits(words.view(np.uint8), bitorder="little")


def make_step(cfg: SearchConfig, filt: Filter):
    """Raw (unjitted) device step: (centers, table, D, bits) ->
    (centers', masks).  masks: (V, M*K/32) u32 — one packed hit plane per
    candidate variant.  Exposed unjitted so parallel/mesh.py can wrap it
    in shard_map; single-device users take build_step_fn below.
    """
    m_, k_ = cfg.centers, cfg.group_k
    h = k_ // 2
    is_center = np.zeros(k_, dtype=bool)
    is_center[h] = True
    variants = _variants(cfg)
    beta1 = jnp.asarray(fe.BETA1_LIMBS)
    beta2 = jnp.asarray(fe.BETA2_LIMBS)

    def step(cx, cy, tx, ty, dpx, dpy, bits):
        # --- batch affine chord: P[m,i] = C[m] + T[i], plus center advance
        dx = fe.sub_mod(tx[None], cx[:, None])             # (M, K, 16)
        dxc = fe.sub_mod(dpx, cx)                          # (M, 16) advance
        inv_in = jnp.concatenate(
            [dx.reshape(-1, 16), dxc.reshape(-1, 16)], axis=0)
        pad = -inv_in.shape[0] % cfg.lanes
        if pad:
            inv_in = jnp.concatenate(
                [inv_in, jnp.broadcast_to(jnp.asarray(fe.ONE), (pad, 16))],
                axis=0)
        inv = fe.inv_mod_p_batch(inv_in, lanes=cfg.lanes)
        inv_dx = inv[:m_ * k_].reshape(m_, k_, 16)
        inv_dxc = inv[m_ * k_:m_ * k_ + m_]

        px, py = ecc.affine_add(cx[:, None], cy[:, None], tx[None], ty[None],
                                inv_dx)
        cmask = jnp.asarray(is_center)[None, :, None]
        px = jnp.where(cmask, cx[:, None], px)
        py = jnp.where(cmask, cy[:, None], py)
        px = px.reshape(-1, 16)
        py = py.reshape(-1, 16)

        ncx, ncy = ecc.affine_add(cx, cy, jnp.broadcast_to(dpx, cx.shape),
                                  jnp.broadcast_to(dpy, cy.shape), inv_dxc)

        # --- endo point synthesis (x, bx, b2x) x (y, -y) as needed
        xs = {0: px}
        ys = {0: py}
        need_beta = any(e in (2, 3, 4, 5) for e, _ in variants)
        need_neg = any(e in (1, 3, 5) for e, _ in variants)
        if need_beta:
            xs[1] = fe.mul_mod_p(px, jnp.broadcast_to(beta1, px.shape))
            xs[2] = fe.mul_mod_p(px, jnp.broadcast_to(beta2, px.shape))
        if need_neg:
            ys[1] = fe.neg_mod(py)
        # endo idx -> (x variant, y variant): see golden.endo_points
        emap = {0: (0, 0), 1: (0, 1), 2: (1, 0), 3: (1, 1), 4: (2, 0),
                5: (2, 1)}

        masks = []
        for e, is33 in variants:
            xv, yv = emap[e]
            hw = (hash160.addr33_hash if is33 else hash160.addr65_hash)(
                xs[xv], ys[yv])
            hit = filt.device_probe(hw)
            masks.append(_pack_mask(hit))
        return ncx, ncy, jnp.stack(masks, axis=0)

    return step


def build_step_fn(cfg: SearchConfig, filt: Filter):
    return jax.jit(make_step(cfg, filt), donate_argnums=(0, 1))


def points_from_scalars(scalars: list[int], how: str = "auto"):
    """Affine points scalar*G as limb arrays, computed either with one
    batched device double-and-add or with the host golden model (faster
    for small counts and compile-free — used by tests and dryruns)."""
    if how == "auto":
        how = "host" if len(scalars) <= 4096 else "device"
    if how == "host":
        pts = [golden.point_mul(s) if s % N else (0, 0) for s in scalars]
        return (jnp.asarray(fe.ints_to_limbs([p[0] for p in pts])),
                jnp.asarray(fe.ints_to_limbs([p[1] for p in pts])))
    kl = jnp.asarray(fe.ints_to_limbs(scalars))
    x, y, z = jax.jit(ecc.scalar_mul)(kl)
    return jax.jit(ecc.proj_to_affine, static_argnames="lanes")(
        x, y, z, lanes=min(1024, len(scalars)))


@functools.lru_cache(maxsize=8)
def _cached_table(stride: int, k: int, mk: int, how: str = "auto"):
    """Device gpoints table T[i] = (i - K/2)*stride*G and advance point
    D = M*K*stride*G (counterpart of ctx_precompute_gpoints,
    main.c:219-246, built host-side with an incremental add chain like
    the reference; i == K/2 is the infinity slot, stored as (0, 0))."""
    h = k // 2
    step = golden.point_mul(stride)
    p = golden.point_mul((-h * stride) % N)
    pts = []
    for _ in range(k):
        pts.append(p if p is not None else (0, 0))
        p = golden.point_add(p, step)
    pts.append(golden.point_mul((mk * stride) % N))
    ax = jnp.asarray(fe.ints_to_limbs([q[0] for q in pts]))
    ay = jnp.asarray(fe.ints_to_limbs([q[1] for q in pts]))
    return ax[:k], ay[:k], ax[k], ay[k]


class AddSearch:
    """Single-device add-mode engine over one contiguous key span.

    Multi-chip scaling shards *spans* across devices (parallel/mesh.py);
    each engine instance owns one device's span.
    """

    def __init__(self, cfg: SearchConfig, filt: Filter, init: str = "auto"):
        self.cfg = cfg
        self.filt = filt
        self.init_how = init
        self.step_fn = build_step_fn(cfg, filt)
        self.variants = _variants(cfg)
        mk = cfg.keys_per_step
        self.tx, self.ty, self.dpx, self.dpy = _cached_table(
            cfg.stride, cfg.group_k, mk, init)
        self.bits = jnp.asarray(filt.device_bits)
        self.k_checked = 0
        self.k_found = 0

    def _check_no_degenerate(self, base: int, n_keys: int) -> None:
        """The chord kernel assumes P != +-Q.  A center key c collides
        exactly when c = +-(i - K/2)*s (a table point) or c = +-M*K*s
        (the advance point) mod N.  Center keys are base + k*s for a
        known set of offsets k, so membership is an exact O(K) host
        check — the reference instead enforces range_s > GROUP
        (main.c:687-690); this is the precise version of that guard."""
        cfg = self.cfg
        s = cfg.stride
        k_ = cfg.group_k
        mk = cfg.keys_per_step
        s_inv = pow(s, -1, N)
        # all degenerate scalar values (+- covered by symmetric j range)
        bad = {(j * s) % N for j in range(-(k_ // 2), k_ // 2 + 1)}
        bad |= {(mk * s) % N, (-mk * s) % N}
        # center keys live at offsets {m*K + K/2 + t*MK}; conservatively
        # test every offset in the (step-rounded) span
        # only *center* keys take part in chord additions; centers sit at
        # flat offsets k with k % K == K/2
        span = -(-n_keys // mk) * mk
        for v in bad:
            k = ((v - base) * s_inv) % N
            if k < span and k % k_ == k_ // 2:
                raise ValueError(
                    f"invalid search range: key {v:#x} inside the span "
                    f"collides with the batch geometry (K={k_}, M="
                    f"{cfg.centers}, stride=2^{cfg.stride_offs}); shift "
                    f"the range start or change geometry")

    def _init_centers(self, base: int):
        cfg = self.cfg
        h = cfg.group_k // 2
        keys = [(base + (m * cfg.group_k + h) * cfg.stride) % N
                for m in range(cfg.centers)]
        return points_from_scalars(keys, self.init_how)

    def run_span(self, base: int, n_keys: int, hit_offsets_valid=None,
                 on_found=None, on_step=None) -> list[Found]:
        """Search keys base + i*stride for i in [0, n_keys).

        hit_offsets_valid: optional predicate(offset)->bool restricting
        which offsets may produce finds (claim-coverage parity filter).
        on_step(keys_done): called after each completed device step with
        the cumulative searched-key count (checkpoint cursor hook).
        """
        cfg = self.cfg
        mk = cfg.keys_per_step
        self._check_no_degenerate(base, -(-n_keys // mk) * mk)
        cx, cy = self._init_centers(base)
        found = []
        steps = -(-n_keys // mk)
        for t in range(steps):
            cx, cy, masks = self.step_fn(cx, cy, self.tx, self.ty,
                                         self.dpx, self.dpy, self.bits)
            masks_np = np.asarray(masks)
            if masks_np.any():
                found.extend(self._handle_hits(
                    base, t * mk, n_keys, masks_np, hit_offsets_valid,
                    on_found))
            if on_step:
                on_step(min((t + 1) * mk, n_keys))
        return found

    def _handle_hits(self, base, step_off, n_keys, masks_np,
                     hit_offsets_valid, on_found) -> list[Found]:
        out = []
        for v, (e, is33) in enumerate(self.variants):
            idxs = np.nonzero(unpack_mask(masks_np[v]))[0]
            for j in idxs:
                off = step_off + int(j)
                if off >= n_keys:
                    continue  # step overshoot beyond the span
                if hit_offsets_valid is not None and not hit_offsets_valid(off):
                    continue
                priv = common.recover_priv(base, off, self.cfg.stride, e)
                label = "addr33" if is33 else "addr65"
                h = common.derive_h160(priv, is33)
                # authoritative host check (exact filter semantics)
                if not self.filt.confirm(bytes.fromhex(h)):
                    continue  # device prefilter false positive
                common.verify_found(priv, label, h)
                f = Found(label=label, h160=h, priv=priv)
                out.append(f)
                self.k_found += 1
                if on_found:
                    on_found(f)
        return out

    def run_range(self, on_found=None, on_progress=None, start_offset: int = 0,
                  on_step=None) -> list[Found]:
        """Full reference `add` semantics over [range_s, range_e):
        claim planning, coverage rounding, counter accounting.

        start_offset: resume cursor — skip the first `start_offset` keys
        (checkpoint.py); on_step(abs_keys_done) reports cumulative
        progress in absolute key offsets from range_s.
        """
        cfg = self.cfg
        job = cfg.job_size or common.derive_job_size(cfg.range_s, cfg.range_e)
        claims = list(common.plan_claims(cfg.range_s, cfg.range_e, job,
                                         cfg.stride))
        if not claims:
            return []
        # contiguous claims -> one span; coverage windows may overlap
        span_keys = 0
        windows = []
        for c in claims:
            off = (c.start - cfg.range_s) // cfg.stride
            windows.append((off, off + c.coverage))
            span_keys = max(span_keys, off + c.coverage)
            self.k_checked += c.job * (6 if cfg.endo else 1)

        if start_offset >= span_keys:
            return []

        def valid(off):
            return any(a <= off + start_offset < b for a, b in windows)

        found = self.run_span(
            (cfg.range_s + start_offset * cfg.stride) % common.N,
            span_keys - start_offset, hit_offsets_valid=valid,
            on_found=on_found,
            on_step=(lambda done: on_step(start_offset + done))
            if on_step else None)
        if on_progress:
            on_progress(self.k_checked)
        return found
