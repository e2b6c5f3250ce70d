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

from .. import ecc, fe, fel, golden, hash160
from ..filters import Filter
from . import common
from .common import Found, SearchConfig
from .add import _pack_mask, unpack_mask

N = golden.N


def _host_progression(start: "golden.Point", step: "golden.Point",
                      count: int) -> list:
    """count affine points start, start+step, ... via incremental host
    adds (the reference builds its tables the same way,
    ctx_precompute_gpoints main.c:228-236)."""
    out = []
    p = start
    for _ in range(count):
        out.append(p)
        p = golden.point_add(p, step)
    return out


def _gtable_cache_path(w: int) -> str | None:
    import os
    base = os.environ.get("ECLOOP_CACHE_DIR", "/tmp/ecloop_jax_cache")
    if not base:
        return None
    return os.path.join(base, f"gtable_w{w}.npy")


@functools.lru_cache(maxsize=2)
def build_gtable(w: int = 14, lanes: int = 1024, how: str = "auto"):
    """Build the gtable: (tx, ty) of shape (d*(2^w-1), 16), flat layout
    index = (2^w - 1) * window + (digit - 1).

    Device build is 3 fixed-shape jit graphs (TPU-friendly, no
    shape-polymorphic recompiles), executed row-by-row so peak HBM is
    one projective row + the growing affine table (a w=22 table is
    6.4 GB — materializing all rows' projective intermediates at once,
    as a lax.scan over rows would, OOMs at w >= 18):
      1. row 0 (j*G for j in 1..2^w-1) = one batched affine add over the
         outer sum of two host-built seed tables j = a + b*2^(w/2),
      2. row i = 2^w * row i-1: one jitted w-fold projective doubling
         graph per row,
      3. one chunked batch reduction to affine per row.

    The finished table is cached on disk (it is a pure function of w):
    a warm start is one 80 MB load instead of minutes of build graphs.
    """
    import os
    n = 1 << w
    d = (255 // w) + 1
    cache = _gtable_cache_path(w)
    if cache and os.path.exists(cache) and how != "host":
        both = np.load(cache)
        return jnp.asarray(both[0]), jnp.asarray(both[1])
    if how == "auto":
        # the host progression is ~1 min at w=14 (and cached on disk
        # after the first run); the device build's fixed-shape graphs
        # take far longer than that just to compile.  "device" stays
        # available explicitly (and is what bench-gtable exercises).
        how = "host"
    if how == "host":
        pts = []
        for i in range(d):
            base = golden.point_mul(pow(2, w * i, N))
            pts.extend(_host_progression(base, base, n - 1))
        tx = np.asarray(fe.ints_to_limbs([p[0] for p in pts]))
        ty = np.asarray(fe.ints_to_limbs([p[1] for p in pts]))
        _gtable_cache_save(cache, tx, ty)
        return jnp.asarray(tx), jnp.asarray(ty)

    # --- 1. row 0: j*G via outer sum of seed tables --------------------
    half = 1 << (w // 2)
    rest = n // half
    t1 = _host_progression(golden.G, golden.G, half)          # a*G, a in 1..half
    g_half = golden.point_mul(half)
    t2 = _host_progression(g_half, g_half, rest - 1)          # b*half*G, b>=1
    t1x, t1y = ecc.ints_to_pts(t1)
    t2x, t2y = ecc.ints_to_pts(t2)
    # j = a + b*half: b = 0 -> t1 directly; b >= 1 -> batched add
    px = jnp.broadcast_to(t1x[None], (rest - 1, half, 16)).reshape(-1, 16)
    py = jnp.broadcast_to(t1y[None], (rest - 1, half, 16)).reshape(-1, 16)
    qx = jnp.broadcast_to(t2x[:, None], (rest - 1, half, 16)).reshape(-1, 16)
    qy = jnp.broadcast_to(t2y[:, None], (rest - 1, half, 16)).reshape(-1, 16)
    add = jax.jit(ecc.batch_add_or_dbl, static_argnames="lanes")
    sx, sy = add(px, py, qx, qy, lanes=min(lanes, (rest - 1) * half))
    r0x = jnp.concatenate([t1x, sx], axis=0)[:n - 1]   # j = 1 .. n-1
    r0y = jnp.concatenate([t1y, sy], axis=0)[:n - 1]

    # --- 2+3. per row: scale by 2^w, reduce to affine ------------------
    @jax.jit
    def scale_row(x, y, z):
        for _ in range(w):
            x, y, z = ecc.proj_dbl(x, y, z)
        return x, y, z

    rdc = jax.jit(ecc.proj_to_affine, static_argnames="lanes")
    lanes_r = min(lanes, n - 1)
    rows_x, rows_y = [r0x], [r0y]
    x, y = r0x, r0y
    z = jnp.broadcast_to(jnp.asarray(fe.ONE), r0x.shape)
    for _ in range(d - 1):
        x, y, z = scale_row(x, y, z)
        ax, ay = rdc(x, y, z, lanes=lanes_r)
        rows_x.append(ax)
        rows_y.append(ay)
    tx = jnp.concatenate(rows_x, axis=0)
    ty = jnp.concatenate(rows_y, axis=0)
    _gtable_cache_save(cache, np.asarray(tx), np.asarray(ty))
    return jax.device_put(tx), jax.device_put(ty)


def _gtable_cache_save(cache: str | None, tx: np.ndarray,
                       ty: np.ndarray) -> None:
    if not cache:
        return
    import os
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp.npy"
        np.save(tmp, np.stack([tx, ty]))
        os.replace(tmp, cache)
    except OSError:
        pass


def keys_to_words(keys: list[int]) -> np.ndarray:
    """list of ints -> (B, 4) u64 little-endian word rows."""
    raw = b"".join(k.to_bytes(32, "little") for k in keys)
    return np.frombuffer(raw, dtype="<u8").reshape(len(keys), 4)


def word_to_int(row: np.ndarray) -> int:
    return int.from_bytes(row.tobytes(), "little")


_N_WORDS = np.frombuffer(N.to_bytes(32, "little"), dtype="<u8").copy()


def words_mod_n(words: np.ndarray) -> np.ndarray:
    """Reduce (B, 4) u64 key words mod the curve order, vectorized
    (reference fe_modn_from_hex semantics).  Keys < 2^256 and
    n > 2^255, so at most one conditional subtraction."""
    ge = np.zeros(len(words), bool)
    eq = np.ones(len(words), bool)
    for i in (3, 2, 1, 0):
        gt = eq & (words[:, i] > _N_WORDS[i])
        lt = eq & (words[:, i] < _N_WORDS[i])
        ge |= gt
        eq &= ~(gt | lt)
    ge |= eq                      # == n reduces to 0 as well
    if not ge.any():
        return words
    words = words.copy()
    r = words[ge]
    borrow = np.zeros(r.shape[0], np.uint64)
    for i in range(4):
        ni = _N_WORDS[i]
        wi = r[:, i].copy()
        nb = (wi < ni) | ((wi == ni) & (borrow == np.uint64(1)))
        r[:, i] = wi - ni - borrow
        borrow = nb.astype(np.uint64)
    words[ge] = r
    return words


def window_digits_words(words: np.ndarray, w: int) -> np.ndarray:
    """(B, 4) u64 key words -> (B, d) window digits; 0 marks a zero
    digit (skip).  d shift/mask column ops, no per-key Python.

    The host ships RAW DIGITS (uint16 for w <= 16, uint32 above) and
    the device derives the flat table index digit-1 + (2^w-1)*i — half
    the host->device bytes of an int32 flat-index batch at the default
    width, which matters through the device tunnel (~2.5 MB/job at
    batch 64k)."""
    n = 1 << w
    d = (255 // w) + 1
    out = np.empty((len(words), d),
                   dtype=np.uint16 if w <= 16 else np.uint32)
    for i in range(d):
        j, sh = divmod(w * i, 64)
        lo = words[:, j] >> np.uint64(sh)
        if sh and j + 1 < 4:
            lo = lo | (words[:, j + 1] << np.uint64(64 - sh))
        out[:, i] = (lo & np.uint64(n - 1)).astype(out.dtype)
    return out


def window_digits(keys: list[int], w: int) -> np.ndarray:
    """(B, d) uint16 window digits from int keys (see
    window_digits_words)."""
    return window_digits_words(keys_to_words(keys), w)


def window_indices(keys: list[int], w: int) -> np.ndarray:
    """(B, d) int32 flat gather indices; -1 marks a zero digit (skip).
    (The step graph itself consumes window_digits; this flat form is
    kept for the bench rows and index tests.)"""
    dig = window_digits(keys, w).astype(np.int64)
    n1 = (1 << w) - 1
    out = (dig - 1 + n1 * np.arange(dig.shape[1], dtype=np.int64)[None, :])
    out[dig == 0] = -1
    return out.astype(np.int32)


def parse_keys(lines: list[str], raw: bool) -> list[int]:
    """Hex private keys, or -raw: SHA-256 of the line bytes
    (reference main.c:503-527)."""
    if raw:
        return [int.from_bytes(hashlib.sha256(ln.encode()).digest(), "big")
                for ln in lines]
    return [int(ln, 16) % N for ln in lines]


def interleave_gtable(tx, ty):
    """(N, 16) x 2 -> (N, 32) rows [x limbs || y limbs].

    One gather serves both coordinates: TPU gathers of small rows are
    fixed-cost dominated, and the interleaved layout measured 3.8x
    faster than two 16-limb gathers at batch 64k (1.08 vs 4.09
    ms/window, tools/exp_mul_profile.py on v5e; a transposed limb-plane
    layout was 5x SLOWER, and a one-hot bf16 MXU matmul gather ties XY
    but costs 2x the table memory)."""
    return jnp.concatenate([tx, ty], axis=1)


def make_mul_step(cfg: SearchConfig, filt: Filter, w: int, batch: int,
                  scan: bool | None = None):
    """Raw (unjitted) mul step: (dig (d, B) u16, txy (N, 32), bits) ->
    masks (V, B/32).  Exposed unjitted so parallel/mesh.py can wrap it
    in shard_map; single-device users take build_mul_step below.

    scan: fold windows with lax.scan (compile-friendly under an outer
    jit — the mesh builder always jits) vs an eager Python window loop
    (small cached per-op kernels for the eager CPU engine).  Default
    follows the engine's jit policy (add._use_jit).

    Limb-first accumulation: the per-window gather pulls interleaved
    (N, 32) x||y rows (interleave_gtable), then converts to fel rows
    for the field math."""
    from .add import _use_jit, _use_pallas
    use_jit = _use_jit() if scan is None else scan
    use_pallas = _use_pallas() and batch % 1024 == 0
    # full-tile layout: (B/1024, 8, 128) rows use all 8 sublanes; flat
    # (B,) rows run the VPU at 1/8 width (see search/add.py r3d)
    tiled = use_jit and batch % 1024 == 0
    bshape = (batch // 1024, 8, 128) if tiled else (batch,)

    def t3(rows):
        return (tuple(r.reshape(bshape) for r in rows) if tiled
                else tuple(rows))

    n1 = (1 << w) - 1

    def step(dig, txy, bits):
        def make_body(complete):
            def body(carry, xs):
                off_i, dig_i = xs
                qx, qy, qz = carry
                di = dig_i.astype(jnp.int32)
                idx_i = jnp.maximum(di - 1 + off_i, 0)
                g = jnp.take(txy, idx_i, axis=0)
                gx = t3(tuple(g[:, i] for i in range(16)))
                gy = t3(tuple(g[:, 16 + i] for i in range(16)))
                skip = (di == 0).reshape(bshape)
                if use_pallas:
                    # fused Mosaic window step: keeps the ~12 unrolled
                    # modmuls of the add out of the XLA graph — the XLA
                    # form's whole-step cold compile through the remote
                    # relay was ~37 min (r5 measured; VERDICT r4 #4)
                    from .. import pallas_kernels
                    return pallas_kernels.proj_add_affine_pallas(
                        qx, qy, qz, gx, gy, skip, complete), None
                nx, ny, nz = ecc.proj_add_affine_rows(qx, qy, qz, gx, gy,
                                                      complete=complete)
                qx = fel.select(skip, qx, nx)
                qy = fel.select(skip, qy, ny)
                qz = fel.select(skip, qz, nz)
                return (qx, qy, qz), None
            return body

        # windows 0..d-2 can never hit the P == Q doubling case (see
        # proj_add_affine_rows docstring): accumulator scalar < 2^(w*i)
        # <= table-point scalar < n.  Only the top window (whose table
        # points wrap mod n) needs the complete add.
        body = make_body(False)
        last = make_body(True)
        zero = fel.const_rows(0, bshape)
        one = fel.const_rows(1, bshape)
        offs = jnp.arange(dig.shape[0], dtype=jnp.int32) * n1
        if use_jit:
            carry, _ = jax.lax.scan(body, (zero, one, zero),
                                    (offs[:-1], dig[:-1]))
            (qx, qy, qz), _ = last(carry, (offs[-1], dig[-1]))
        else:
            # eager CPU path: a Python window loop keeps each op a small
            # cached kernel (lax.scan would compile the whole body chain)
            carry = (zero, one, zero)
            for i in range(dig.shape[0] - 1):
                carry, _ = body(carry, (offs[i], dig[i]))
            (qx, qy, qz), _ = last(carry, (offs[-1], dig[-1]))
        if tiled:
            # inversion works on flat rows; the x/y*z^-1 muls stay tiled
            zflat = tuple(r.reshape(-1) for r in qz)
            if use_pallas:
                from .. import pallas_kernels
                zinv = pallas_kernels.inv_mod_batch_pallas(zflat)
            else:
                zinv = fel.inv_mod_batch(zflat, lanes=min(cfg.lanes, batch))
            zinv = t3(zinv)
            ax = fel.mul_mod(qx, zinv)
            ay = fel.mul_mod(qy, zinv)
        else:
            ax, ay = ecc.proj_to_affine_rows(qx, qy, qz,
                                             lanes=min(cfg.lanes, batch),
                                             use_pallas=use_pallas)

        # Fused Pallas hash on TPU, like add.make_step: 27-30% faster
        # than the XLA pipeline AND keeps the fully-unrolled SHA/RMD
        # rounds out of the XLA graph — the mul step's cold compile
        # through the remote relay exceeded 30 min with them inlined
        # (r4 evidence run, stage mul_vector rc=124).
        import os
        pallas_hash = (use_pallas
                       and os.environ.get("ECLOOP_PALLAS_HASH", "1") != "0"
                       and batch % 1024 == 0)
        if pallas_hash:
            from .. import pallas_kernels
            h33f = pallas_kernels.addr33_hash_rows_pallas
            h65f = pallas_kernels.addr65_hash_rows_pallas
        else:
            h33f = hash160.addr33_hash_rows
            h65f = hash160.addr65_hash_rows
        masks = []
        if cfg.addr33:
            masks.append(_pack_mask(filt.device_probe(h33f(ax, ay))))
        if cfg.addr65:
            masks.append(_pack_mask(filt.device_probe(h65f(ax, ay))))
        return jnp.stack(masks, axis=0)

    return step


def build_mul_step(cfg: SearchConfig, filt: Filter, w: int, batch: int):
    """Single-device jitted mul step (see make_mul_step)."""
    from .add import _use_jit
    step = make_mul_step(cfg, filt, w, batch)
    return jax.jit(step) if _use_jit() else step


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
        self.txy = interleave_gtable(*build_gtable(w, cfg.lanes, init))
        self.bits = jnp.asarray(filt.device_bits)
        self.step_fn = self._build_step(cfg, filt, w, batch)
        self.k_checked = 0
        self.k_found = 0
        # in-flight (job, masks, on_found) jobs; depth > 1 hides the
        # host<->device mask-fetch round-trip latency behind several
        # dispatched steps (ECLOOP_MUL_INFLIGHT overrides)
        import collections
        import os
        self._depth = int(os.environ.get("ECLOOP_MUL_INFLIGHT", "4"))
        self._pending = collections.deque()

    def _build_step(self, cfg: SearchConfig, filt: Filter, w: int,
                    batch: int):
        """Step-graph factory — subclass hook (ShardedMulSearch swaps in
        the mesh builder so no unused single-device graph is created)."""
        return build_mul_step(cfg, filt, w, batch)

    def run_keys(self, keys: list[int], on_found=None,
                 drain: bool = True) -> list[Found]:
        """Int-key convenience wrapper over run_words (tests, bench)."""
        return self.run_words(words_mod_n(keys_to_words(keys)),
                              on_found=on_found, drain=drain)

    def run_words(self, words: np.ndarray, on_found=None,
                  drain: bool = True) -> list[Found]:
        """Dispatch jobs of `batch` keys given as (B, 4) u64 LE word
        rows (already reduced mod n); the mask fetch of each job is
        deferred until the NEXT job is dispatched (host parse and device
        step overlap — JAX async dispatch provides the pipelining the
        reference gets from its producer/consumer queue).  With
        drain=False one job may remain in flight across calls (the CLI's
        streaming path); such callers must finish with flush().

        The whole host path is numpy-vectorized: per-key Python (int
        parse, to_bytes) measured ~30-60 ms per 32k job — comparable to
        the 27 ms device step it feeds (tools/exp_mul_batch.py r5)."""
        found = []
        for off in range(0, len(words), self.batch):
            job = words[off:off + self.batch]
            dig = window_digits_words(job, self.w)
            pad = self.batch - len(job)
            if pad:
                # digit 0 = skip in every window: padding lanes stay at
                # infinity and can never probe as hits
                dig = np.concatenate(
                    [dig, np.zeros((pad, dig.shape[1]), dig.dtype)], axis=0)
            # ascontiguousarray: transferring the transposed VIEW makes
            # the runtime copy it strided (row-by-row through the
            # tunnel); one host-side copy keeps the put at ~1 GB/s
            masks = self.step_fn(jnp.asarray(np.ascontiguousarray(dig.T)),
                                 self.txy, self.bits)
            try:
                # start the device->host mask copy as soon as the step
                # finishes: the blocking fetch at drain time measured
                # ~39 ms of read latency through the device tunnel,
                # serializing with the next job's parse (r5 profile)
                masks.copy_to_host_async()
            except AttributeError:  # pragma: no cover — older jax
                pass
            self._pending.append((job, masks, on_found))
            while len(self._pending) > self._depth:
                found.extend(self._drain_one(on_found))
        if drain:
            found.extend(self.flush(on_found))
        return found

    def flush(self, on_found=None) -> list[Found]:
        """Drain all in-flight jobs; returns their finds."""
        found = []
        while self._pending:
            found.extend(self._drain_one(on_found))
        return found

    def _drain_one(self, on_found=None) -> list[Found]:
        job, masks, pending_on_found = self._pending.popleft()
        found = self._handle_hits(job, np.asarray(masks),
                                  pending_on_found or on_found)
        self.k_checked += len(job)
        return found

    def run_lines(self, lines, on_found=None,
                  drain: bool = True) -> list[Found]:
        lines = [ln.rstrip("\r\n") for ln in lines]
        lines = [ln for ln in lines if ln]
        if not self.raw:
            # bulk hex parse: one fromhex over the joined (left-padded)
            # lines, byte-reverse to LE words — no per-key int objects
            try:
                b = bytes.fromhex("".join(ln.zfill(64) for ln in lines))
                arr = np.frombuffer(b, np.uint8).reshape(-1, 32)[:, ::-1]
                words = words_mod_n(
                    np.ascontiguousarray(arr).view("<u8"))
                return self.run_words(words, on_found=on_found,
                                      drain=drain)
            except ValueError:
                pass                    # odd-length/overlong lines
        keys = parse_keys(lines, self.raw)
        return self.run_keys(keys, on_found=on_found, drain=drain)

    def _handle_hits(self, job, masks_np, on_found) -> list[Found]:
        out = []
        labels = ([("addr33", True)] if self.cfg.addr33 else []) + \
                 ([("addr65", False)] if self.cfg.addr65 else [])
        for v, (label, is33) in enumerate(labels):
            idxs = np.nonzero(unpack_mask(masks_np[v]))[0]
            for j in idxs:
                if j >= len(job):
                    continue  # padding lane
                priv = word_to_int(job[int(j)])
                h = common.derive_h160(priv, is33)
                if not self.filt.confirm(bytes.fromhex(h)):
                    continue
                f = Found(label=label, h160=h, priv=priv)
                out.append(f)
                self.k_found += 1
                if on_found:
                    on_found(f)
        return out
