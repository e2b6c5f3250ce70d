"""The consolidated CPU-vs-TPU graph-form policy (ecloop_tpu.policy)
and its three call sites (fe loop unrolling, hash160 round structure,
fel native row forms) — VERDICT r4 weak #6."""

import os

import pytest

from ecloop_tpu import fe, fel, hash160
from ecloop_tpu.policy import tpu_graph_forms


def _clear(monkeypatch):
    for v in ("ECLOOP_TPU_FORMS", "ECLOOP_FE_UNROLL",
              "ECLOOP_HASH_UNROLL", "ECLOOP_FEL_NATIVE"):
        monkeypatch.delenv(v, raising=False)


def test_global_switch_drives_all_three_sites(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("ECLOOP_TPU_FORMS", "1")
    assert fe._unroll_default() is True
    assert hash160._unroll_default() is True
    assert fel._native_forms() is True
    monkeypatch.setenv("ECLOOP_TPU_FORMS", "0")
    assert fe._unroll_default() is False
    assert hash160._unroll_default() is False
    assert fel._native_forms() is False


@pytest.mark.parametrize("site_env,site_fn", [
    ("ECLOOP_FE_UNROLL", lambda: fe._unroll_default()),
    ("ECLOOP_HASH_UNROLL", lambda: hash160._unroll_default()),
    ("ECLOOP_FEL_NATIVE", lambda: fel._native_forms()),
])
def test_site_override_beats_global(monkeypatch, site_env, site_fn):
    _clear(monkeypatch)
    monkeypatch.setenv("ECLOOP_TPU_FORMS", "0")
    monkeypatch.setenv(site_env, "1")
    assert site_fn() is True
    monkeypatch.setenv("ECLOOP_TPU_FORMS", "1")
    monkeypatch.setenv(site_env, "0")
    assert site_fn() is False


def test_default_follows_backend(monkeypatch):
    _clear(monkeypatch)
    import jax
    expect = jax.default_backend() != "cpu"
    assert tpu_graph_forms() is expect
    assert fe._unroll_default() is expect
    assert hash160._unroll_default() is expect
    assert fel._native_forms() is expect
