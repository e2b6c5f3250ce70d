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

from .. import ecc, fe, fel, golden, hash160
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
    """bool bits (any shape, flat order preserved) -> (B//32,) u32,
    little-endian bit order."""
    b = bits.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def _use_jit() -> bool:
    """Whole-step jit is the TPU production path.  XLA:CPU's compile
    time on these graphs is pathological (>30 min per geometry on one
    core), so on CPU the step runs eagerly — each jnp op compiles once
    (seconds) and is cached by shape; at test shapes the dispatch
    overhead is negligible.  Override with ECLOOP_JIT=0/1."""
    import os
    v = os.environ.get("ECLOOP_JIT")
    if v is not None:
        return v == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return True


def _use_pallas() -> bool:
    """Pallas kernels need the real TPU backend (Mosaic); CPU tests use
    the XLA fallback.  Override with ECLOOP_PALLAS=0/1."""
    import os
    v = os.environ.get("ECLOOP_PALLAS")
    if v is not None:
        return v == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def unpack_mask(words: np.ndarray) -> np.ndarray:
    # np.asarray of a device array can carry tiled (non-C-contiguous)
    # strides at small shapes, and .view(np.uint8) then raises
    # "last axis must be contiguous" — normalize first.
    return np.unpackbits(np.ascontiguousarray(words).view(np.uint8),
                         bitorder="little")


def make_step(cfg: SearchConfig, filt: Filter):
    """Raw (unjitted) device step: (centers, table, D, bits) ->
    (centers', masks).  masks: (V, M*K/32) u32 — one packed hit plane per
    candidate variant.  Exposed unjitted so parallel/mesh.py can wrap it
    in shard_map; single-device users take build_step_fn below.

    The table holds only the POSITIVE multiples T[j] = (j+1)*s*G
    (j < K/2); the mirror neighbors C - T[j] share T[j].x, so one
    inverted dx serves the +- pair — the TPU form of the reference's
    y-negated second gpoints half (main.c:237-243), halving the
    group-inversion batch.
    """
    m_, k_ = cfg.centers, cfg.group_k
    k2 = k_ // 2
    variants = _variants(cfg)
    use_pallas = _use_pallas()

    def r3d(rows):
        """rows -> (X, 8, 128) tiles (full sublane+lane utilization);
        passthrough when the batch doesn't divide (tiny test shapes)."""
        if rows[0].size % 1024:
            return rows
        return tuple(r.reshape(-1, 8, 128) for r in rows)

    def step(cx, cy, tx, ty, dpx, dpy, bits):
        # limb-first throughout: tuples of 16 uint32 rows (fel.py)
        cxr = fel.from_last(cx)                      # rows (M,)
        cyr = fel.from_last(cy)
        txr = fel.from_last(tx)                      # rows (K/2,)
        tyr = fel.from_last(ty)
        dpxr = fel.from_last(dpx)                    # rows ()
        dpyr = fel.from_last(dpy)

        cxb = tuple(r[:, None] for r in cxr)         # (M, 1)
        cyb = tuple(r[:, None] for r in cyr)
        txb = tuple(r[None, :] for r in txr)         # (1, K/2)
        tyb = tuple(r[None, :] for r in tyr)

        # --- batch affine chords: C[m] +- T[j], plus center advance
        dx = fel.sub_mod(txb, cxb)                   # rows (M, K/2)
        dxc = fel.sub_mod(tuple(jnp.broadcast_to(r, cxr[0].shape)
                                for r in dpxr), cxr)  # rows (M,)
        nh = m_ * k2
        inv_in = tuple(jnp.concatenate([a.reshape(-1), b], axis=0)
                       for a, b in zip(dx, dxc))
        pad = -(nh + m_) % max(cfg.lanes, 1024)
        if pad:
            onep = fel.const_rows(1, (pad,))
            inv_in = tuple(jnp.concatenate([a, o], axis=0)
                           for a, o in zip(inv_in, onep))
        if use_pallas:
            from .. import pallas_kernels
            inv = pallas_kernels.inv_mod_batch_pallas(inv_in)
        else:
            inv = fel.inv_mod_batch(inv_in, lanes=cfg.lanes)
        idx = tuple(r[:nh].reshape(m_, k2) for r in inv)
        inv_dxc = tuple(r[nh:nh + m_] for r in inv)

        # chord math on (X, 8, 128) tiles
        bshape = (m_, k2)
        cxt = r3d(tuple(jnp.broadcast_to(r, bshape) for r in cxb))
        cyt = r3d(tuple(jnp.broadcast_to(r, bshape) for r in cyb))
        txt = r3d(tuple(jnp.broadcast_to(r, bshape) for r in txb))
        tyt = r3d(tuple(jnp.broadcast_to(r, bshape) for r in tyb))
        idxt = r3d(idx)
        xp, yp = ecc.affine_add_rows(cxt, cyt, txt, tyt, idxt)
        xm, ym = ecc.affine_add_rows(cxt, cyt, txt, fel.neg_mod(tyt), idxt)
        xp = tuple(r.reshape(bshape) for r in xp)
        yp = tuple(r.reshape(bshape) for r in yp)
        xm = tuple(r.reshape(bshape) for r in xm)
        ym = tuple(r.reshape(bshape) for r in ym)

        # layout offsets 0..K-1, center at h = K/2:
        #   [flip(minus: h-1..0), center, plus[:-1]: h+1..K-1]
        px = r3d(tuple(jnp.concatenate(
            [jnp.flip(a, axis=1), c, b[:, :k2 - 1]], axis=1).reshape(-1)
            for a, c, b in zip(xm, cxb, xp)))
        py = r3d(tuple(jnp.concatenate(
            [jnp.flip(a, axis=1), c, b[:, :k2 - 1]], axis=1).reshape(-1)
            for a, c, b in zip(ym, cyb, yp)))

        ncxr, ncyr = ecc.affine_add_rows(
            cxr, cyr,
            tuple(jnp.broadcast_to(r, cxr[0].shape) for r in dpxr),
            tuple(jnp.broadcast_to(r, cyr[0].shape) for r in dpyr),
            inv_dxc)

        # --- endo point synthesis (x, bx, b2x) x (y, -y) as needed
        xs = {0: px}
        ys = {0: py}
        need_beta = any(e in (2, 3, 4, 5) for e, _ in variants)
        need_neg = any(e in (1, 3, 5) for e, _ in variants)
        if need_beta:
            xs[1] = fel.mul_mod(px, fel.const_rows(golden.BETA1))
            xs[2] = fel.mul_mod(px, fel.const_rows(golden.BETA2))
        if need_neg:
            ys[1] = fel.neg_mod(py)
        # endo idx -> (x variant, y variant): see golden.endo_points
        emap = {0: (0, 0), 1: (0, 1), 2: (1, 0), 3: (1, 1), 4: (2, 0),
                5: (2, 1)}

        # Fused Pallas hash kernel: default ON where Pallas runs.  With
        # fori-amortized timing (tools/exp_hash_probe.py — the earlier
        # "equal within noise" readings measured dispatch latency, not
        # execution) the Pallas form is 27% faster for addr33 (774 vs
        # 1065 us/131k) and 30% for addr65.  ECLOOP_PALLAS_HASH=0 opts
        # back into the XLA pipeline.
        import os
        pallas_hash = (use_pallas and os.environ.get("ECLOOP_PALLAS_HASH",
                                                     "1") != "0"
                       and xs[0][0].size % 1024 == 0)
        masks = []
        for e, is33 in variants:
            xv, yv = emap[e]
            if pallas_hash:
                from .. import pallas_kernels
                hw = (pallas_kernels.addr33_hash_rows_pallas if is33
                      else pallas_kernels.addr65_hash_rows_pallas)(
                          xs[xv], ys[yv])
            else:
                hw = (hash160.addr33_hash_rows if is33
                      else hash160.addr65_hash_rows)(xs[xv], ys[yv])
            hit = filt.device_probe(hw)
            masks.append(_pack_mask(hit))
        return fel.to_last(ncxr), fel.to_last(ncyr), jnp.stack(masks, axis=0)

    return step


def build_step_fn(cfg: SearchConfig, filt: Filter):
    """Jitted step; with cfg.steps_per_call > 1, T steps run inside one
    dispatch via lax.scan and masks return stacked (T, V, M*K/32)."""
    raw = make_step(cfg, filt)
    t_ = cfg.steps_per_call
    if not _use_jit():
        if t_ <= 1:
            return raw

        def multi_eager(cx, cy, tx, ty, dpx, dpy, bits):
            masks = []
            for _ in range(t_):
                cx, cy, m = raw(cx, cy, tx, ty, dpx, dpy, bits)
                masks.append(m)
            return cx, cy, jnp.stack(masks, axis=0)

        return multi_eager
    if t_ <= 1:
        return jax.jit(raw, donate_argnums=(0, 1))

    def multi(cx, cy, tx, ty, dpx, dpy, bits):
        def body(carry, _):
            cx, cy = carry
            ncx, ncy, masks = raw(cx, cy, tx, ty, dpx, dpy, bits)
            return (ncx, ncy), masks

        (cx, cy), masks = jax.lax.scan(body, (cx, cy), None, length=t_)
        return cx, cy, masks

    return jax.jit(multi, donate_argnums=(0, 1))


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
    """Positive-half gpoints table T[j] = (j+1)*stride*G (j < K/2) and
    advance point D = M*K*stride*G (counterpart of
    ctx_precompute_gpoints, main.c:219-246, built host-side with an
    incremental add chain like the reference; the negative half is
    synthesized on device by y-negation)."""
    step = golden.point_mul(stride)
    p = step
    pts = []
    for _ in range(k // 2):
        pts.append(p)
        p = golden.point_add(p, step)
    pts.append(golden.point_mul((mk * stride) % N))
    ax = jnp.asarray(fe.ints_to_limbs([q[0] for q in pts]))
    ay = jnp.asarray(fe.ints_to_limbs([q[1] for q in pts]))
    return ax[:-1], ay[:-1], ax[-1], ay[-1]


def check_no_degenerate(cfg: SearchConfig, base: int, n_keys: int) -> None:
    """The chord kernel assumes P != +-Q.  A center key c collides
    exactly when c = +-(i - K/2)*s (a table point) or c = +-M*K*s
    (the advance point) mod N.  Center keys are base + k*s for a
    known set of offsets k, so membership is an exact O(K) host
    check — the reference instead enforces range_s > GROUP
    (main.c:687-690); this is the precise version of that guard.
    Shared by the single-device and sharded engines (both use the same
    key->lane layout, so the degenerate set is identical)."""
    s = cfg.stride
    k_ = cfg.group_k
    mk = cfg.keys_per_step
    s_inv = pow(s, -1, N)
    # all degenerate scalar values (+- covered by symmetric j range)
    bad = {(j * s) % N for j in range(-(k_ // 2), k_ // 2 + 1)}
    bad |= {(mk * s) % N, (-mk * s) % N}
    # only *center* keys take part in chord additions; centers sit at
    # flat offsets k with k % K == K/2, conservatively over the
    # step-rounded span
    span = -(-n_keys // mk) * mk
    for v in bad:
        k = ((v - base) * s_inv) % N
        if k < span and k % k_ == k_ // 2:
            raise ValueError(
                f"invalid search range: key {v:#x} inside the span "
                f"collides with the batch geometry (K={k_}, M="
                f"{cfg.centers}, stride=2^{cfg.stride_offs}); shift "
                f"the range start or change geometry")


class RangeDriver:
    """Full reference `add` semantics over [range_s, range_e): claim
    planning, coverage rounding, counter accounting (cmd_add /
    cmd_add_worker, main.c:405-454).  Mixin shared by the single-device
    and the sharded engines so k_checked and the found set are
    chip-count independent; subclasses provide run_span()."""

    cfg: SearchConfig
    k_checked: int
    # keys actually stepped by the last run_span call (x6 with endo) —
    # the honest per-span counter for direct run_span callers, who would
    # otherwise read k_checked == 0 (k_checked is run_range's claim-based
    # reference-parity counter and run_span never touches it)
    span_checked: int = 0

    def run_span(self, base, n_keys, hit_offsets_valid=None, on_found=None,
                 on_step=None):
        """Search keys base + i*stride, i in [0, n_keys); returns the
        Found list and sets self.span_checked = n_keys * endo_mult.
        CONTRACT: run_span does NOT touch k_checked — counter accounting
        is run_range's job (claim-based, reference cmd_add parity)."""
        raise NotImplementedError

    def _init_centers(self, base: int):
        """Affine points of the M group centers for a span starting at
        `base` (layout doc at module top) — shared by both engines so
        the key->lane mapping is chip-count independent."""
        cfg = self.cfg
        h = cfg.group_k // 2
        keys = [(base + (m * cfg.group_k + h) * cfg.stride) % N
                for m in range(cfg.centers)]
        return points_from_scalars(keys, self.init_how)

    def run_range(self, on_found=None, on_progress=None, start_offset: int = 0,
                  on_step=None, range_s: int | None = None,
                  range_e: int | None = None) -> list[Found]:
        """start_offset: resume cursor — skip the first `start_offset`
        keys (checkpoint.py); on_step(abs_keys_done) reports cumulative
        progress in absolute key offsets from range_s.  range_s/range_e
        override cfg's bounds for this call (rnd mode's per-iteration
        sub-ranges — the bounds never participate in the compiled step
        graph or the precomputed tables, so the engine is reusable
        across sub-ranges without mutating shared cfg)."""
        cfg = self.cfg
        rs = cfg.range_s if range_s is None else range_s
        re_ = cfg.range_e if range_e is None else range_e
        job = cfg.job_size or common.derive_job_size(rs, re_)
        claims = list(common.plan_claims(rs, re_, job, cfg.stride))
        if not claims:
            return []
        # contiguous claims -> one span; coverage windows may overlap
        span_keys = 0
        windows = []
        for c in claims:
            off = (c.start - rs) // cfg.stride
            windows.append((off, off + c.coverage))
            span_keys = max(span_keys, off + c.coverage)
            self.k_checked += c.job * (6 if cfg.endo else 1)

        if start_offset >= span_keys:
            return []

        def valid(off):
            return any(a <= off + start_offset < b for a, b in windows)

        found = self.run_span(
            (rs + start_offset * cfg.stride) % common.N,
            span_keys - start_offset, hit_offsets_valid=valid,
            on_found=on_found,
            on_step=(lambda done: on_step(start_offset + done))
            if on_step else None)
        if on_progress:
            on_progress(self.k_checked)
        return found


class AddSearch(RangeDriver):
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
        t_ = max(1, cfg.steps_per_call)
        calls = -(-(-(-n_keys // mk)) // t_)
        check_no_degenerate(cfg, base, calls * t_ * mk)
        self.span_checked = n_keys * (6 if cfg.endo else 1)
        cx, cy = self._init_centers(base)
        found = []
        pending = None          # (first step idx, device masks) unfetched
        for c in range(calls):
            cx, cy, masks = self.step_fn(cx, cy, self.tx, self.ty,
                                         self.dpx, self.dpy, self.bits)
            # fetch the PREVIOUS call's masks while this one runs on
            # device (host<->device pipelining; async dispatch gives the
            # overlap the reference gets from its worker queue)
            if pending is not None:
                found.extend(self._drain(pending, base, n_keys,
                                         hit_offsets_valid, on_found,
                                         on_step))
            pending = (c * t_, masks)
        if pending is not None:
            found.extend(self._drain(pending, base, n_keys,
                                     hit_offsets_valid, on_found, on_step))
        return found

    def _drain(self, pending, base, n_keys, hit_offsets_valid, on_found,
               on_step):
        t0, masks = pending
        mk = self.cfg.keys_per_step
        masks_np = np.asarray(masks)
        if masks_np.ndim == 2:                  # single-step call
            masks_np = masks_np[None]
        out = []
        for tt in range(masks_np.shape[0]):
            t = t0 + tt
            if masks_np[tt].any():
                out.extend(self._handle_hits(base, t * mk, n_keys,
                                             masks_np[tt],
                                             hit_offsets_valid, on_found))
            if on_step:
                on_step(min((t + 1) * mk, n_keys))
        return out

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
