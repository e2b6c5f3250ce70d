"""Checkpoint/resume subsystem tests."""

import json

import numpy as np
import pytest

from ecloop_tpu import checkpoint, filters, golden
from ecloop_tpu.search.add import AddSearch
from ecloop_tpu.search.common import SearchConfig

TINY = dict(centers=4, group_k=64, lanes=64)


def _filter_for(keys):
    rows = [np.frombuffer(golden.addr33(golden.point_mul(k)),
                          dtype=">u4").astype(np.uint32) for k in keys]
    return filters.filter_from_hashes(np.stack(rows))


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "c.json")
    key = {"cmd": "add", "range_s": "8000"}
    c = checkpoint.Checkpoint(path, key, min_interval=0)
    assert not c.try_resume()
    c.save(cursor=1024, k_checked=4096, k_found=1, force=True)

    c2 = checkpoint.Checkpoint(path, key)
    assert c2.try_resume()
    assert c2.cursor == 1024 and c2.k_checked == 4096 and c2.k_found == 1

    # config mismatch refuses to resume
    c3 = checkpoint.Checkpoint(path, {"cmd": "add", "range_s": "9000"})
    with pytest.raises(ValueError):
        c3.try_resume()

    # atomic write: file is valid json after many rapid saves
    for i in range(10):
        c2.save(cursor=i, force=True)
    assert json.load(open(path))["cursor"] == 9


def test_checkpoint_throttling(tmp_path):
    path = str(tmp_path / "c.json")
    c = checkpoint.Checkpoint(path, {}, min_interval=9999)
    c.save(cursor=1, force=True)
    c.save(cursor=2)  # throttled: cursor attr updates, file does not
    assert json.load(open(path))["cursor"] == 1
    assert c.cursor == 2
    c.save(force=True)
    assert json.load(open(path))["cursor"] == 2


def test_add_resume_finds_remaining_keys(tmp_path):
    """Resume mid-range: keys before the cursor are skipped, keys after
    are still found, and the union over both halves is the full set."""
    early, late = 0x70000 + 5, 0x70000 + 0x300
    filt = _filter_for([early, late])
    cfg = SearchConfig(range_s=0x70000, range_e=0x70400, addr33=True, **TINY)
    mk = cfg.keys_per_step  # 256

    eng = AddSearch(cfg, filt, init="host")
    steps_seen = []
    found_first = eng.run_range(on_step=steps_seen.append)
    # claim coverage rounds the 0x400-key range up to GROUP (2048) keys
    # hashed (reference batch_add coverage semantics)
    span = -(-0x400 // 2048) * 2048
    assert steps_seen[-1] == span
    assert {f.priv for f in found_first} == {early, late}

    # resume from offset 256 (one step in): only the late key remains
    eng2 = AddSearch(cfg, filt, init="host")
    found_resumed = eng2.run_range(start_offset=mk)
    assert {f.priv for f in found_resumed} == {late}

    # resume from past the end of the coverage span: nothing to do
    eng3 = AddSearch(cfg, filt, init="host")
    assert eng3.run_range(start_offset=span) == []


def test_config_key_covers_identity_fields(tmp_path):
    cfg = SearchConfig(range_s=0x8000, range_e=0xFFFF, addr33=True)
    k1 = checkpoint.config_key_for("add", cfg, "f.txt")
    cfg2 = SearchConfig(range_s=0x8000, range_e=0xFFFF, addr33=True,
                        endo=True)
    k2 = checkpoint.config_key_for("add", cfg2, "f.txt")
    assert k1 != k2
    # batch geometry is NOT identity: resume across different geometry ok
    cfg3 = SearchConfig(range_s=0x8000, range_e=0xFFFF, addr33=True,
                        centers=128)
    assert checkpoint.config_key_for("add", cfg3, "f.txt") == k1


def test_single_process_refuses_stale_multihost_siblings(tmp_path):
    """A single-process run pointed at a -c path whose only state is
    multi-host .pN siblings must refuse (it would otherwise silently
    restart from offset 0) — ADVICE r4."""
    base = tmp_path / "state.json"
    (tmp_path / "state.json.p0").write_text("{}")
    (tmp_path / "state.json.p1").write_text("{}")
    import pytest
    with pytest.raises(ValueError, match="per-process siblings"):
        checkpoint.process_local_path(str(base))
    # once the un-suffixed file exists the siblings are just leftovers
    base.write_text("{}")
    assert checkpoint.process_local_path(str(base)) == str(base)


def test_reconcile_multihost_single_process_identity():
    assert checkpoint.reconcile_multihost(123, 456, 7) == (123, 456, 7)
