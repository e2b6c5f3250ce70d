"""Host-side search bookkeeping shared by add/mul/rnd modes.

All scalar (private-key) arithmetic on the host is plain Python ints —
the TPU never needs mod-N math (the reference's fe_modn_* layer,
lib/ecc.c:164-265, collapses into this module).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

from .. import golden, native

N = golden.N


def derive_h160(priv: int, is33: bool) -> str:
    """hash160(priv*G) as hex — the host re-derivation used on device
    prefilter hits.  Uses the independent native C++ oracle when built
    (a *different* implementation from both the device kernels and the
    Python golden model), else the golden model."""
    if native.available():
        h = native.pk_hash160(priv % N, is33)
        if h is not None:
            return h.hex()
    pt = golden.point_mul(priv)
    return (golden.addr33(pt) if is33 else golden.addr65(pt)).hex()

# reference constants (main.c:16-17); GROUP is the coverage-rounding unit
# of a claim (batch_add processes ceil(job/GROUP) groups of GROUP keys)
MAX_JOB_SIZE = 2 * 1024 * 1024
GROUP = 2048

ENDO_LABELS = list(range(6))  # endo index, reference main.c:267-276


@dataclasses.dataclass
class SearchConfig:
    range_s: int = GROUP
    range_e: int = golden.P
    stride_offs: int = 0              # -d offset: stride = 2^offs
    addr33: bool = True
    addr65: bool = False
    endo: bool = False
    job_size: int | None = None       # derived like main.c:440-442
    # device batch geometry: one step covers lanes*... = centers*K keys
    # geometry default = the measured TPU optimum (tools/exp_step_sweep:
    # throughput is flat in M*K from 128k to 512k keys/step, 32x4096 has
    # the lowest compile time and matches bench.py so CLI runs share the
    # persistent executable cache)
    centers: int = 32                 # M parallel group centers
    group_k: int = 4096               # K keys per center per step
    lanes: int = 4096                 # batch-inversion vector width
    steps_per_call: int = 8           # device steps fused per dispatch
    #  (amortizes host<->device dispatch/fetch latency — ~25 ms per mask
    #  fetch through the device tunnel vs ~3 ms device compute per step;
    #  masks come back stacked (T, V, M*K/32))

    @property
    def stride(self) -> int:
        return 1 << self.stride_offs

    @property
    def keys_per_step(self) -> int:
        return self.centers * self.group_k


@dataclasses.dataclass(frozen=True)
class Found:
    label: str                        # "addr33" | "addr65"
    h160: str                         # 40 hex chars
    priv: int

    def line(self) -> str:
        return f"{self.label}: {self.h160} <- {self.priv:064x}"

    def tsv(self) -> str:
        """Output-file format parity (main.c:192-196)."""
        return f"{self.label}\t{self.h160}\t{self.priv:064x}"


@dataclasses.dataclass(frozen=True)
class Claim:
    """One worker claim: keys pk + i*stride for i in [0, coverage)."""
    start: int                        # starting private key
    job: int                          # k_checked increment (job_size)
    coverage: int                     # ceil(job/GROUP)*GROUP keys hashed


def plan_claims(range_s: int, range_e: int, job_size: int,
                stride: int) -> Iterator[Claim]:
    """Reproduce the reference's claim arithmetic exactly
    (cmd_add_worker, main.c:405-435): cursor walks range_s by
    job_size*stride mod N until it passes range_e or wraps."""
    cursor = range_s
    while cursor < range_e:
        cov = -(-job_size // GROUP) * GROUP
        yield Claim(start=cursor, job=job_size, coverage=cov)
        nxt = (cursor + job_size * stride) % N
        if nxt < range_s:  # overflow check (main.c:420)
            return
        cursor = nxt


def derive_job_size(range_s: int, range_e: int) -> int:
    """main.c:440-442: job = min(range_e - range_s, MAX_JOB_SIZE)."""
    return min(range_e - range_s, MAX_JOB_SIZE)


def verify_found(priv: int, label: str, expect_h160: str) -> None:
    """Full re-derivation oracle (pk_verify_hash, main.c:248-263):
    derive pubkey from scratch and compare the hash.  Raises on mismatch
    (a math bug that survived to a filter hit)."""
    h = derive_h160(priv, label == "addr33")
    if h != expect_h160:
        raise AssertionError(
            f"hash mismatch for pk={priv:064x} ({label}): "
            f"expected {expect_h160}, derived {h}")


def recover_priv(base: int, offset: int, stride: int, endo_idx: int) -> int:
    """Private key of candidate (offset, endo) relative to claim base
    (calc_priv semantics, main.c:267-276)."""
    k = (base + offset * stride) % N
    return golden.endo_priv(k, endo_idx)
