"""Speed-of-light accounting: how close each hot kernel runs to the
hardware ceiling (SURVEY.md §5 "per-kernel keys/s + speed-of-light
comparison"; VERDICT r1 #5).

The search pipeline is pure 32-bit integer element-wise work, so the
relevant ceiling is the VPU: `sublanes x lanes x ALUs x clock` 32-bit op
slots per second per chip (the MXU is unusable — there are no matmuls —
and at ~1.5 kops per 64-byte field element the pipeline is compute-bound,
not HBM-bound, by >100x).

Methodology:
  * every loop-free leaf kernel (modmul, modsqr, chord add, SHA-256,
    RIPEMD-160, bloom probe) is traced with jax.make_jaxpr and its
    arithmetic primitives are counted per element — the count is the
    *algorithm's* op budget, independent of XLA scheduling;
  * speed-of-light rate = VPU peak ops/s ÷ ops per element;
  * utilization = measured rate ÷ speed-of-light rate.
Counts are exact for the traced graph (scan bodies multiplied by trip
count); XLA's CSE can only reduce them, so utilization is conservative
(reported utilization <= true hardware utilization).

Peak numbers: the VPU is an (8, 128) grid = 1024 lanes with multiple
int ALUs per lane; the peak used here is **4 int32 ops per lane per
cycle** (3.85 T at 0.94 GHz on v5e).  Two calibrations bracket it:
  * serial DEPENDENT u32 chains (tools/exp_vpu_slope.py: x = x*x + c,
    forced with a host fetch) sustain ~740 G ops/s = 0.77 ops/lane/
    cycle — that is the latency-bound floor (one op at a time per
    lane), NOT the issue-width ceiling;
  * the production step, whose SHA/RMD rounds and 16-limb products
    have abundant instruction-level parallelism, streams >1.3 T
    traced-ops/s end-to-end (2.04 ms for a 131k-key endo step, round
    3) — only possible with multi-issue lanes, which is why the
    round-3 interim "1 op/lane/cycle" model (calibrated on the serial
    chain) under-stated the ceiling and over-stated utilization.
Utilization printed against the 4-issue peak is therefore conservative
in the other direction: a kernel with little ILP (long carry chains)
cannot reach it.  Override with ECLOOP_VPU_PEAK / ECLOOP_HBM_PEAK
(ops/s, bytes/s) for unlisted hardware.
"""

from __future__ import annotations

import os

import jax
import numpy as np

# device_kind substring -> (clock GHz, HBM GB/s)
_KNOWN = {
    "v5 lite": (0.94, 819),       # v5e
    "v5e": (0.94, 819),
    "v5p": (1.75, 2765),
    "v4": (1.05, 1228),
    "v6 lite": (1.70, 1640),      # trillium
    "v6e": (1.70, 1640),
    "v3": (0.94, 900),
    "v2": (0.70, 700),
}
_VPU_SLOTS = 8 * 128 * 4          # sublanes x lanes x 4-issue ALUs
                                  # (see module docstring for the two
                                  # bracketing calibrations)


def peaks(device=None) -> tuple[float, float]:
    """(vector int32 ops/sec, HBM bytes/sec) for the target device."""
    vpu = os.environ.get("ECLOOP_VPU_PEAK")
    hbm = os.environ.get("ECLOOP_HBM_PEAK")
    if vpu and hbm:
        return float(vpu), float(hbm)
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    clock, bw = 0.94, 819          # default to v5e
    for key, (c, b) in _KNOWN.items():
        if key in kind:
            clock, bw = c, b
            break
    return (float(vpu) if vpu else _VPU_SLOTS * clock * 1e9,
            float(hbm) if hbm else bw * 1e9)


# --- jaxpr op counting -----------------------------------------------------

# primitives that occupy one VPU op slot per output element
_ARITH = {
    "add", "sub", "mul", "neg", "rem", "max", "min",
    "and", "or", "xor", "not",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "lt", "le", "gt", "ge", "eq", "ne",
    "select_n", "convert_element_type", "clamp", "population_count",
    "add_any",
}
# pure data-movement / layout: free at the ALU (may cost HBM, tracked
# separately by XLA; ignored here since the pipeline is compute-bound)
_FREE = {
    "reshape", "broadcast_in_dim", "squeeze", "transpose", "slice",
    "concatenate", "rev", "iota", "copy", "stop_gradient", "reduce_or",
    "reduce_and", "reduce_sum", "reduce_max", "reduce_min", "pad",
    "gather", "dynamic_slice", "dynamic_update_slice", "bitcast_convert_type",
}


def _numel(var) -> int:
    return int(np.prod(var.aval.shape)) if var.aval.shape else 1


def count_jaxpr_ops(jaxpr) -> int:
    """Total arithmetic element-ops in a (closed) jaxpr."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "closed_call", "core_call", "remat_call",
                    "custom_jvp_call", "custom_vjp_call", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            total += count_jaxpr_ops(inner)
        elif name == "scan":
            total += eqn.params["length"] * count_jaxpr_ops(
                eqn.params["jaxpr"])
        elif name == "while":
            raise ValueError(
                "while_loop in traced kernel: trip count unknowable; "
                "trace an unrolled form instead")
        elif name in _ARITH:
            total += max((_numel(v) for v in eqn.outvars), default=1)
        elif name in _FREE or name.startswith("random_"):
            continue
        else:
            # unknown primitive: count as one slot per element
            # (conservative for the ceiling)
            total += max((_numel(v) for v in eqn.outvars), default=1)
    return total


def ops_per_element(fn, *args, elems: int) -> float:
    """Trace fn(*args) and return arithmetic ops per element."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return count_jaxpr_ops(jaxpr) / elems


# --- kernel + step budgets ---------------------------------------------------

def _rows(shape=(8, 128)):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 16, size=(16,) + shape, dtype=np.uint32)
    return tuple(jax.numpy.asarray(v) for v in vals)


def leaf_budgets() -> dict[str, float]:
    """Ops/element for every hot leaf kernel (traced, loop-free).

    Traced with the TPU-native (fully unrolled limb-row) forms even on
    CPU so the budget reflects what the production device executes."""
    from . import ecc, hash160

    saved = os.environ.get("ECLOOP_FEL_NATIVE")
    os.environ["ECLOOP_FEL_NATIVE"] = "1"
    try:
        return _leaf_budgets_native(ecc, hash160)
    finally:
        if saved is None:
            os.environ.pop("ECLOOP_FEL_NATIVE", None)
        else:
            os.environ["ECLOOP_FEL_NATIVE"] = saved


def _leaf_budgets_native(ecc, hash160) -> dict[str, float]:
    from . import fel

    shape = (8, 128)
    n = 8 * 128
    a, b = _rows(shape), _rows(shape)
    out = {}
    out["mul_mod"] = ops_per_element(fel.mul_mod, a, b, elems=n)
    out["sqr_mod"] = ops_per_element(fel.sqr_mod, a, elems=n)
    out["add_mod"] = ops_per_element(fel.add_mod, a, b, elems=n)
    out["sub_mod"] = ops_per_element(fel.sub_mod, a, b, elems=n)
    out["chord_add"] = ops_per_element(
        lambda px, py, qx, qy, idx: ecc.affine_add_rows(px, py, qx, qy, idx),
        a, b, _rows(shape), _rows(shape), _rows(shape), elems=n)
    out["addr33"] = ops_per_element(hash160.addr33_hash_rows, a, b, elems=n)
    out["addr65"] = ops_per_element(hash160.addr65_hash_rows, a, b, elems=n)
    # device prefilter probes over a dummy 1 MiB filter: the exact-mod
    # .blf probe (k configurable, Barrett mod per probe) and the pow2
    # masked probe used for hash-list targets (2 probes, no division)
    from . import bloom
    bits = jax.numpy.zeros(1 << 18, dtype=jax.numpy.uint32)
    h = jax.numpy.zeros((n, 5), dtype=jax.numpy.uint32)
    out["bloom_probe"] = ops_per_element(
        lambda hw: bloom.probe_exact(hw, bits, 8294400, 20), h, elems=n)
    out["bloom_probe_k3"] = ops_per_element(
        lambda hw: bloom.probe_exact(hw, bits, 8294400, 3), h, elems=n)
    out["probe_pow2"] = ops_per_element(
        lambda hw: bloom.probe_pow2(hw, bits, 23, 2), h, elems=n)
    # list-mode compare prefilter (filters.Filter._use_cmp): one
    # equality per target first-word + an any-reduce; K=160 is the
    # puzzle fixture size
    t0 = jax.numpy.zeros(160, dtype=jax.numpy.uint32)
    out["probe_cmp"] = ops_per_element(
        lambda hw: (hw[..., 0, None] == t0).any(-1), h, elems=n)
    z = _rows(shape)
    out["proj_add_affine"] = ops_per_element(
        lambda x1, y1, z1, x2, y2: ecc.proj_add_affine_rows(
            x1, y1, z1, x2, y2, complete=False),
        a, b, z, _rows(shape), _rows(shape), elems=n)
    out["proj_add_affine_complete"] = ops_per_element(
        lambda x1, y1, z1, x2, y2: ecc.proj_add_affine_rows(
            x1, y1, z1, x2, y2, complete=True),
        a, b, z, _rows(shape), _rows(shape), elems=n)
    return out


def step_budget(cfg, leaf: dict[str, float] | None = None,
                variants: int | None = None,
                probe: str = "probe_pow2") -> dict:
    """Analytic per-key op budget of one add-mode search step.

    Composition per M*K-key step (search/add.make_step):
      dx subs:        (MK/2 + M) sub_mod
      batch inverse:  (MK/2 + M) elements x (3 mul amortized) +
                      (255 sqr + 15 mul) / lanes per element
      chords:         MK/2 pairs x 2 chord evaluations (+/- share inv)
      center advance: M chords (negligible)
      endo synthesis: 2 mul per key when endo (beta*x, beta^2*x)
      hash+probe:     V variants x (addr33 + bloom_probe)
    """
    leaf = leaf or leaf_budgets()
    mk = cfg.keys_per_step
    inv_elems = mk / 2 + cfg.centers
    if variants is None:
        variants = (6 if cfg.endo else 1) * (int(cfg.addr33) + int(cfg.addr65))

    per_key = {}
    per_key["dx sub"] = leaf["sub_mod"] * inv_elems / mk
    per_key["batch inverse"] = (
        (3 * leaf["mul_mod"]
         + (255 * leaf["sqr_mod"] + 15 * leaf["mul_mod"]) / cfg.lanes)
        * inv_elems / mk)
    per_key["chord add"] = leaf["chord_add"]          # 2 evals / 2 keys
    per_key["endo synth"] = 2 * leaf["mul_mod"] if cfg.endo else 0.0
    per_key["hash+probe"] = variants * (leaf["addr33"] + leaf[probe])
    total = sum(per_key.values())
    checked_mult = 6 if cfg.endo else 1
    return {
        "per_key": per_key,
        "total_ops_per_point": total,
        "ops_per_checked_key": total / checked_mult,
        "checked_mult": checked_mult,
    }


def mul_step_budget(cfg, w: int, leaf: dict[str, float] | None = None,
                    probe: str = "probe_pow2") -> dict:
    """Analytic per-key budget of one mul-mode job (search/mul
    make_mul_step) — BOTH the VPU op budget and the HBM gather budget,
    because the gtable window gathers are data-dependent HBM reads that
    the op counter treats as free (SURVEY §7: 'HBM gather bandwidth
    will bound mul'; VERDICT r2 weak #4).

    Per key: d = ceil(255/w)+1 window gathers (2 coords x 16 u32 limbs
    = 128 B each from a d*(2^w - 1)-row table — too large to cache for
    w >= 10) + d-1 incomplete and 1 complete projective mixed adds +
    one amortized batch inversion + 2 muls to affine + hash + probe.
    """
    leaf = leaf or leaf_budgets()
    d = (255 // w) + 1
    variants = int(cfg.addr33) + int(cfg.addr65)
    per_key = {
        "window adds": (d - 1) * leaf["proj_add_affine"]
        + leaf["proj_add_affine_complete"],
        "batch inverse": 3 * leaf["mul_mod"]
        + (255 * leaf["sqr_mod"] + 15 * leaf["mul_mod"]) / cfg.lanes
        + 2 * leaf["mul_mod"],
        "hash+probe": variants * (leaf["addr33"] + leaf[probe]),
    }
    total = sum(per_key.values())
    gather_bytes = d * 2 * 16 * 4          # d windows x (x,y) x 16 u32
    return {
        "per_key": per_key,
        "total_ops_per_key": total,
        "gather_bytes_per_key": gather_bytes,
        "windows": d,
    }


def mul_ceiling(cfg, w: int, leaf: dict[str, float] | None = None,
                device=None, scan_only: bool = False) -> dict:
    """Mul-mode speed-of-light: min(VPU-bound, HBM-gather-bound) keys/s
    for window width w, with which bound binds.  scan_only=True budgets
    just the gtable window scan (what bench-gtable measures — reference
    bench.c:114-141 likewise times ec_gtable_mul alone); False budgets
    the full production job (scan + inversion + hash + probe)."""
    vpu, hbm = peaks(device)
    b = mul_step_budget(cfg, w, leaf)
    ops = (b["per_key"]["window adds"] if scan_only
           else b["total_ops_per_key"])
    vpu_rate = vpu / ops
    hbm_rate = hbm / b["gather_bytes_per_key"]
    return {
        "vpu_bound_keys_per_s": vpu_rate,
        "hbm_bound_keys_per_s": hbm_rate,
        "ceiling_keys_per_s": min(vpu_rate, hbm_rate),
        "binding": "vpu" if vpu_rate <= hbm_rate else "hbm",
        **b,
    }


def report(cfg, measured_keys_per_sec: float | None = None,
           device=None, probe: str = "probe_cmp") -> str:
    """Human-readable speed-of-light breakdown for the add-mode step.
    probe defaults to the list-mode compare prefilter (the headline
    bench's filter is the 160-entry puzzle list)."""
    vpu, _ = peaks(device)
    leaf = leaf_budgets()
    b = step_budget(cfg, leaf, probe=probe)
    lines = [
        f"# speed-of-light budget (VPU peak {vpu / 1e12:.2f} T int32-ops/s)",
        f"{'leaf kernel':24s} {'ops/elem':>10s}",
    ]
    for k, v in leaf.items():
        lines.append(f"{k:24s} {v:10.0f}")
    lines.append("")
    lines.append(f"{'step component':24s} {'ops/point':>10s} {'share':>7s}")
    total = b["total_ops_per_point"]
    for k, v in b["per_key"].items():
        lines.append(f"{k:24s} {v:10.0f} {v / total:6.1%}")
    sol = vpu / b["ops_per_checked_key"]
    lines.append(f"{'TOTAL':24s} {total:10.0f}")
    lines.append(f"speed-of-light: {sol / 1e6:.1f} M checked-keys/s/chip "
                 f"({b['ops_per_checked_key']:.0f} ops/checked-key)")
    if measured_keys_per_sec:
        lines.append(f"measured:       {measured_keys_per_sec / 1e6:.1f} "
                     f"M keys/s = {measured_keys_per_sec / sol:.1%} of SoL")
    return "\n".join(lines)
