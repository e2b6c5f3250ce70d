"""Speed-of-light accounting tests (ecloop_tpu/sol.py).

The op counter is trace-level (jax.make_jaxpr), so these tests are
compile-free and fast on CPU.
"""

import jax.numpy as jnp
import numpy as np

from ecloop_tpu import sol
from ecloop_tpu.search.common import SearchConfig


def test_count_simple_graph():
    a = jnp.zeros((8, 128), jnp.uint32)
    # one add per element
    assert sol.ops_per_element(lambda x, y: x + y, a, a, elems=8 * 128) == 1.0
    # fused chain: add + mul + shift = 3 ops/elem
    fn = lambda x, y: ((x + y) * y) >> 3  # noqa: E731
    assert sol.ops_per_element(fn, a, a, elems=8 * 128) == 3.0


def test_count_scan_multiplies_by_length():
    import jax

    a = jnp.zeros((128,), jnp.uint32)

    def fn(x):
        def body(c, _):
            return c + x, None
        out, _ = jax.lax.scan(body, x, None, length=10)
        return out

    # 10 iterations x 1 add x 128 elems
    assert sol.ops_per_element(fn, a, elems=128) == 10.0


def test_leaf_budgets_sane():
    leaf = sol.leaf_budgets()
    # 16x16 schoolbook + fold: hundreds-to-thousands of ops per element
    assert 500 < leaf["mul_mod"] < 4000
    # squaring must be cheaper than general multiply
    assert leaf["sqr_mod"] < leaf["mul_mod"]
    assert leaf["add_mod"] < 200
    # hash160 (SHA-256 + RIPEMD-160) dominates a single field op
    assert leaf["addr33"] > leaf["mul_mod"]
    assert leaf["addr65"] > leaf["addr33"]  # two SHA blocks vs one


def test_step_budget_composition():
    leaf = sol.leaf_budgets()
    b_plain = sol.step_budget(SearchConfig(endo=False), leaf)
    b_endo = sol.step_budget(SearchConfig(endo=True), leaf)
    assert b_plain["checked_mult"] == 1 and b_endo["checked_mult"] == 6
    # endo checks 6 keys per point: cheaper per CHECKED key
    assert (b_endo["ops_per_checked_key"]
            < b_plain["ops_per_checked_key"])
    # hashing dominates the step (the measured 3:1 hash-bound profile)
    pk = b_endo["per_key"]
    assert pk["hash+probe"] > 0.5 * b_endo["total_ops_per_point"]


def test_mul_budget_and_ceiling():
    leaf = sol.leaf_budgets()
    cfg = SearchConfig(addr33=True, addr65=False)
    b14 = sol.mul_step_budget(cfg, 14, leaf)
    assert b14["windows"] == 19                       # ceil(255/14)+1
    assert b14["gather_bytes_per_key"] == 19 * 128    # 2 coords x 64 B
    # wider window -> fewer gathers
    b20 = sol.mul_step_budget(cfg, 20, leaf)
    assert b20["gather_bytes_per_key"] < b14["gather_bytes_per_key"]
    assert b20["per_key"]["window adds"] < b14["per_key"]["window adds"]

    full = sol.mul_ceiling(cfg, 14, leaf)
    scan = sol.mul_ceiling(cfg, 14, leaf, scan_only=True)
    # scan-only budgets a subset of the work -> ceiling at least as high
    assert (scan["ceiling_keys_per_s"] >= full["ceiling_keys_per_s"])
    assert full["binding"] in ("vpu", "hbm")
    assert full["ceiling_keys_per_s"] == min(full["vpu_bound_keys_per_s"],
                                             full["hbm_bound_keys_per_s"])


def test_peaks_override(monkeypatch):
    monkeypatch.setenv("ECLOOP_VPU_PEAK", "1e12")
    monkeypatch.setenv("ECLOOP_HBM_PEAK", "5e11")
    vpu, hbm = sol.peaks()
    assert vpu == 1e12 and hbm == 5e11
