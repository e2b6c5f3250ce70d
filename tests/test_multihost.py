"""True multi-process (multi-host analog) parity test.

The reference's distributed story is checked by _check.py running the
same search on several ssh hosts and diffing found-sets + counters
(/root/reference/_check.py:19-82).  The TPU-native analog: two local
processes join one `jax.distributed` job (CPU backend, 2 virtual
devices each -> one 4-device global mesh), run the sharded add engine
over one range, and each process drains only its own addressable
shards.  The union of per-process found-sets must be exactly the
planted keys (the single-process result for this vector is pinned by
tests/test_search.py's sharded-vs-single parity tests), each found key
must be reported by exactly ONE process (shard ownership is disjoint),
and the claim-based counters must agree across processes.

Runtime: two XLA:CPU compile passes run concurrently (~minutes), so
the test is opt-in: ECLOOP_TEST_MULTIHOST=1 (CI runs it as its own
step).
"""

import json
import os
import signal
import socket
import subprocess
import sys

import pytest

if not os.environ.get("ECLOOP_TEST_MULTIHOST"):
    pytest.skip("set ECLOOP_TEST_MULTIHOST=1 to run the 2-process test",
                allow_module_level=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# planted keys inside [0x80000, 0x80400)
TARGETS = [0x80123, 0x80234, 0x803F7]

WORKER = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]; outp = sys.argv[3]
repo = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# bare shard_map retraces+recompiles per call; jit makes the 8 steps
# pay one compile (tiny shapes compile fine on XLA:CPU)
os.environ["ECLOOP_JIT"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
sys.path.insert(0, repo)
import numpy as np
from ecloop_tpu import filters, golden
from ecloop_tpu.search.common import SearchConfig
from ecloop_tpu.parallel.mesh import ShardedAddSearch, make_mesh

targets = [int(t, 16) for t in sys.argv[5].split(",")]
rows = [np.frombuffer(golden.addr33(golden.point_mul(k)),
                      dtype=">u4").astype(np.uint32) for k in targets]
filt = filters.filter_from_hashes(np.stack(rows))
cfg = SearchConfig(range_s=0x80000, range_e=0x80400, addr33=True,
                   centers=4, group_k=32, lanes=32)
assert jax.device_count() == 4 and jax.local_device_count() == 2
eng = ShardedAddSearch(cfg, filt, make_mesh(), init="host")
found = eng.run_range()
with open(outp, "w") as f:
    json.dump({"proc": proc_id, "process_count": jax.process_count(),
               "found": sorted(f"{x.priv:x}" for x in found),
               "k_checked": eng.k_checked}, f)
print(f"proc {proc_id} done", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_add_parity(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    targets_arg = ",".join(f"{t:x}" for t in TARGETS)
    procs, outs = [], []
    for i in range(2):
        outp = tmp_path / f"out_{i}.json"
        outs.append(outp)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port), str(outp),
             REPO, targets_arg],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            start_new_session=True))
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except OSError:
                pass
        pytest.fail("multihost workers timed out; partial logs:\n"
                    + "\n".join(logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["process_count"] == 2 for r in results)
    # found keys: disjoint per process, union == planted set
    sets = [set(r["found"]) for r in results]
    assert sets[0].isdisjoint(sets[1]), (
        "a key was drained by both processes — shard ownership leaked")
    assert sets[0] | sets[1] == {f"{t:x}" for t in TARGETS}
    # claim-based counter parity: both processes plan the same claims
    assert results[0]["k_checked"] == results[1]["k_checked"] == 0x400
