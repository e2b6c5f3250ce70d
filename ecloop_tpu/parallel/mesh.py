"""Multi-chip / multi-host scaling: scalar-range sharding over a device mesh.

TPU-native replacement for the reference's distribution story (SURVEY.md
§2.8): the reference scales with pthreads in-process and rsync+ssh across
machines, with a human splitting ranges.  Here:

  * a 1-D `jax.sharding.Mesh` over all chips (axis "rng"),
  * each device owns a **disjoint contiguous key sub-span** — the M group
    centers are sharded over the mesh, so device d advances centers
    m in [d*M/n, (d+1)*M/n) and never communicates with its neighbors
    during search (data-parallel over the keyspace, the only parallelism
    this workload admits — SURVEY.md §2.8),
  * the bloom filter / gpoints table are replicated into every chip's HBM,
  * per-step counters are `psum`ed over the mesh (ICI), hit masks stay
    device-local and stream back asynchronously,
  * multi-host: `jax.distributed.initialize` + `process_index`-derived
    sub-spans (same code path; the mesh covers all processes' devices).

Implemented with `shard_map` so the batched Montgomery inversion stays
shard-local (a plain pjit would let XLA all-gather the inversion scan).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                   # jax >= 0.8 (check_rep renamed)
    from jax import shard_map as _new_shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _new_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:                    # older jax
    from jax.experimental.shard_map import shard_map

from .. import fe, golden
from ..filters import Filter
from ..search import common
from ..search.add import (make_step, _cached_table, _variants, unpack_mask,
                          check_no_degenerate, RangeDriver)
from ..search.common import Found, SearchConfig
from ..search.mul import MulSearch, make_mul_step

N = golden.N


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("rng",))


def sharded_step_builder(cfg: SearchConfig, filt: Filter, mesh: Mesh):
    """Build the pjit-ed multi-chip step.

    Layout: centers (M, 16) sharded over "rng" (M % n_devices == 0);
    table/advance-point/bloom bits replicated; masks (V, M*K/32) sharded
    on their flat-key axis (m-major order makes the shard boundary align
    with u32 words when (M/n)*K % 32 == 0); per-step checked-counter
    psum-reduced over the mesh.
    """
    n = mesh.devices.size
    if cfg.centers % n:
        raise ValueError(f"centers ({cfg.centers}) must divide over "
                         f"{n} devices")
    local_cfg = SearchConfig(**{**cfg.__dict__, "centers": cfg.centers // n})
    raw_step = make_step(local_cfg, filt)

    def spmd_step(cx, cy, tx, ty, dpx, dpy, bits):
        ncx, ncy, masks = raw_step(cx, cy, tx, ty, dpx, dpy, bits)
        checked = jax.lax.psum(
            jnp.asarray(local_cfg.keys_per_step, dtype=jnp.int32), "rng")
        return ncx, ncy, masks, checked

    sharded = shard_map(
        spmd_step, mesh=mesh,
        in_specs=(P("rng"), P("rng"), P(), P(), P(), P(), P()),
        out_specs=(P("rng"), P("rng"), P(None, "rng"), P()),
        check_rep=False)
    # ALWAYS jit, CPU included: a bare shard_map is not eager — it
    # retraces and recompiles the whole program EVERY call (~100 s per
    # step call on one CPU core, measured — the round-2 dryrun timeout
    # and the 17-min multidevice CLI test of r5).  One jitted compile
    # costs the same ~100-170 s once and then runs in ms.
    return jax.jit(sharded, donate_argnums=(0, 1))


class ShardedAddSearch(RangeDriver):
    """Add-mode search sharded over a device mesh.

    Equivalent key coverage to the single-device engine: the global
    center m covers flat keys [t*MK + m*K, t*MK + (m+1)*K) — identical
    layout, so found-set parity is preserved chip-count-independently
    (the reference's multi-host consistency property, SURVEY.md §4.4).
    run_range (RangeDriver) adds the reference's claim planning and
    counter accounting on top, shared verbatim with AddSearch.
    """

    def __init__(self, cfg: SearchConfig, filt: Filter, mesh: Mesh | None = None,
                 init: str = "auto"):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = cfg
        self.filt = filt
        self.init_how = init
        self.step_fn = sharded_step_builder(cfg, filt, self.mesh)
        self.variants = _variants(cfg)
        mk = cfg.keys_per_step
        self.tx, self.ty, self.dpx, self.dpy = _cached_table(
            cfg.stride, cfg.group_k, mk, init)
        self.bits = jnp.asarray(filt.device_bits)
        self.k_checked = 0
        self.k_found = 0

    def _shard_centers(self, cx, cy):
        """Build the sharded center arrays.  Every process computes the
        full (deterministic, host-side) center table and contributes its
        addressable slices — works single- and multi-process."""
        sh = NamedSharding(self.mesh, P("rng"))
        cxn, cyn = np.asarray(cx), np.asarray(cy)
        mk_arr = jax.make_array_from_callback
        return (mk_arr(cxn.shape, sh, lambda idx: cxn[idx]),
                mk_arr(cyn.shape, sh, lambda idx: cyn[idx]))

    @staticmethod
    def _local_mask_words(masks):
        """Fetch only this process's addressable mask shards.

        Returns [(word_offset, (V, w) np.ndarray), ...].  masks is
        (V, W) sharded P(None, "rng"); on a multi-host mesh a plain
        np.asarray would need every shard — each process instead drains
        and verifies the hit words of the ranges it owns."""
        out = []
        for s in masks.addressable_shards:
            sl = s.index[1]
            # ascontiguousarray: device shards can come back with tiled
            # strides at small shapes (see add.unpack_mask)
            out.append((sl.start or 0, np.ascontiguousarray(s.data)))
        # dedupe replicated-shard corner (1-device meshes)
        seen, uniq = set(), []
        for off, w in out:
            if off not in seen:
                seen.add(off)
                uniq.append((off, w))
        return uniq

    def run_span(self, base: int, n_keys: int, hit_offsets_valid=None,
                 on_found=None, on_step=None) -> list[Found]:
        """Search keys base + i*stride for i in [0, n_keys); same
        contract as AddSearch.run_span (counter accounting lives in
        RangeDriver.run_range, which both engines share)."""
        cfg = self.cfg
        mk = cfg.keys_per_step
        steps = -(-n_keys // mk)
        if steps == 0:
            return []
        check_no_degenerate(cfg, base, steps * mk)
        self.span_checked = n_keys * (6 if cfg.endo else 1)
        cx, cy = self._init_centers(base)
        cx, cy = self._shard_centers(cx, cy)
        found = []
        pending = None
        for t0 in range(steps + 1):
            if t0 < steps:
                cx, cy, masks, _ = self.step_fn(cx, cy, self.tx, self.ty,
                                                self.dpx, self.dpy,
                                                self.bits)
            # drain the previous step's masks while this one runs
            if pending is None:
                pending = (t0, masks)
                continue
            t, pmasks = pending
            pending = (t0, masks) if t0 < steps else None
            for word_off, masks_np in self._local_mask_words(pmasks):
                if not masks_np.any():
                    continue
                for v, (e, is33) in enumerate(self.variants):
                    for j in np.nonzero(unpack_mask(masks_np[v]))[0]:
                        off = t * mk + word_off * 32 + int(j)
                        if off >= n_keys:
                            continue
                        if (hit_offsets_valid is not None
                                and not hit_offsets_valid(off)):
                            continue
                        priv = common.recover_priv(base, off, cfg.stride, e)
                        label = "addr33" if is33 else "addr65"
                        hh = common.derive_h160(priv, is33)
                        if not self.filt.confirm(bytes.fromhex(hh)):
                            continue
                        common.verify_found(priv, label, hh)
                        f = Found(label=label, h160=hh, priv=priv)
                        found.append(f)
                        self.k_found += 1
                        if on_found:
                            on_found(f)
            if on_step:
                on_step(min((t + 1) * mk, n_keys))
        return found


def sharded_mul_step_builder(cfg: SearchConfig, filt: Filter, mesh: Mesh,
                             w: int, batch: int):
    """Build the multi-chip mul step: the (d, B) window-index batch is
    sharded over "rng" on its key axis, the gtable / bloom bits are
    replicated into every chip's HBM, and each chip multiplies+hashes
    its own B/n keys — the TPU form of the reference's worker pool
    pulling 2048-key jobs from a shared queue (cmd_mul_worker,
    main.c:456-576: same math per key, chips instead of threads)."""
    n = mesh.devices.size
    if batch % (n * 32):
        raise ValueError(f"mul batch ({batch}) must divide over {n} "
                         f"devices into 32-aligned shards")
    raw_step = make_mul_step(cfg, filt, w, batch // n, scan=True)
    sharded = shard_map(
        raw_step, mesh=mesh,
        in_specs=(P(None, "rng"), P(), P()),
        out_specs=P(None, "rng"),
        check_rep=False)
    # always jit — see sharded_step_builder: bare shard_map recompiles
    # every call
    return jax.jit(sharded)


class ShardedMulSearch(MulSearch):
    """Mul-mode engine sharded over a device mesh.

    Same public API and found-set as the single-device MulSearch: jobs
    of `batch` keys split over the mesh (key j lives on device
    j // (batch/n)), so results are chip-count independent.  `batch`
    here is the GLOBAL job size; size it at per_device_batch * n_devices
    to keep each chip's shard at the single-chip sweet spot."""

    def __init__(self, cfg: SearchConfig, filt: Filter,
                 mesh: Mesh | None = None, w: int = 14, batch: int = 2048,
                 raw: bool = False, init: str = "auto"):
        self.mesh = mesh if mesh is not None else make_mesh()
        super().__init__(cfg, filt, w=w, batch=batch, raw=raw, init=init)

    def _build_step(self, cfg, filt, w, batch):
        return sharded_mul_step_builder(cfg, filt, self.mesh, w, batch)
