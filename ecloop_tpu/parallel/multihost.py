"""Multi-host runtime: `jax.distributed` bring-up + per-process helpers.

The reference scales across machines by rsync+ssh one-shot jobs with the
operator hand-splitting ranges (reference Makefile:77-101, SURVEY.md
§2.8).  The TPU-native replacement is a real distributed runtime: every
host joins one `jax.distributed` job, the 1-D "rng" mesh spans all
chips of all hosts (ICI within a slice, DCN across), and the existing
`ShardedAddSearch` machinery then assigns each chip a disjoint key
sub-span automatically — no manual splitting.  Counters `psum` over the
global mesh; each process drains and verifies only the hit masks of its
own (addressable) shards, so found keys stream to the local host that
owns the range slice.

Launch (same command on every host):

    ECLOOP_COORDINATOR=host0:1234 ECLOOP_NUM_PROCS=4 ECLOOP_PROC_ID=$i \
        python -m ecloop_tpu add -f targets.blf -r ...:... -o found_$i.txt

On TPU pods with standard cluster metadata, plain
`jax.distributed.initialize()` autodetection is used instead — set only
ECLOOP_DISTRIBUTED=1 there.
"""

from __future__ import annotations

import os


def init_from_env() -> bool:
    """Join a jax.distributed job when env asks for one.

    ECLOOP_COORDINATOR=host:port + ECLOOP_NUM_PROCS + ECLOOP_PROC_ID
    configure explicitly; ECLOOP_DISTRIBUTED=1 alone relies on JAX's
    cluster autodetection (TPU pod metadata).  Returns True when a
    multi-process runtime was initialized.
    """
    import jax

    coord = os.environ.get("ECLOOP_COORDINATOR")
    auto = os.environ.get("ECLOOP_DISTRIBUTED") == "1"
    if not coord and not auto:
        return False
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ECLOOP_NUM_PROCS"]),
            process_id=int(os.environ["ECLOOP_PROC_ID"]),
        )
    else:
        jax.distributed.initialize()
    return jax.process_count() > 1


def process_banner() -> str:
    import jax
    return (f"process {jax.process_index()}/{jax.process_count()} ~ "
            f"local devices: {jax.local_device_count()} / "
            f"global: {jax.device_count()}")
