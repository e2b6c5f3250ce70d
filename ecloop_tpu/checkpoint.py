"""Cursor checkpoint / resume.

The reference has NO checkpointing — a crashed run loses its position
(SURVEY.md §5: resume is manual re-run with a narrower -r).  This module
adds the TPU-build extension recommended there: a tiny JSON cursor file,
written atomically (tmp+rename) at a bounded cadence, holding the last
fully-searched key offset plus counters.  `ecloop add ... -c state.json`
resumes exactly where it stopped; found keys remain durable in `-o`
(append + flush per hit, like the reference).

The file is keyed by a config fingerprint (cmd, range, stride, addr
flags, endo, filter path) so a stale checkpoint from a different search
refuses to resume rather than silently skipping keys.
"""

from __future__ import annotations

import json
import os
import time


class Checkpoint:
    def __init__(self, path: str, config_key: dict, min_interval: float = 5.0):
        self.path = path
        self.config_key = dict(config_key)
        self.min_interval = min_interval
        self._last_write = 0.0
        self.cursor = None          # next key offset to search (int)
        self.k_checked = 0
        self.k_found = 0
        self.iters = 0              # rnd-mode completed iterations

    # --- load ---
    def try_resume(self) -> bool:
        """Load existing state. True if it matches this search and has a
        cursor to resume from.  Raises ValueError on config mismatch."""
        if not os.path.exists(self.path):
            return False
        with open(self.path) as f:
            st = json.load(f)
        if st.get("config") != self.config_key:
            raise ValueError(
                f"checkpoint {self.path} belongs to a different search "
                f"(config mismatch); delete it or use another -c path")
        self.cursor = st.get("cursor")
        self.k_checked = int(st.get("k_checked", 0))
        self.k_found = int(st.get("k_found", 0))
        self.iters = int(st.get("iters", 0))
        return self.cursor is not None or self.iters > 0

    # --- save ---
    def save(self, cursor: int | None = None, k_checked: int | None = None,
             k_found: int | None = None, iters: int | None = None,
             force: bool = False) -> None:
        if cursor is not None:
            self.cursor = cursor
        if k_checked is not None:
            self.k_checked = k_checked
        if k_found is not None:
            self.k_found = k_found
        if iters is not None:
            self.iters = iters
        now = time.monotonic()
        if not force and now - self._last_write < self.min_interval:
            return
        self._last_write = now
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({
                "version": 1,
                "config": self.config_key,
                "cursor": self.cursor,
                "k_checked": self.k_checked,
                "k_found": self.k_found,
                "iters": self.iters,
                "ts": time.time(),
            }, f)
        os.replace(tmp, self.path)


def config_key_for(cmd: str, cfg, filter_path: str | None,
                   seed: str | None = None) -> dict:
    key = {
        "cmd": cmd,
        "range_s": f"{cfg.range_s:x}",
        "range_e": f"{cfg.range_e:x}",
        "stride_offs": cfg.stride_offs,
        "addr33": cfg.addr33,
        "addr65": cfg.addr65,
        "endo": cfg.endo,
        "filter": os.path.abspath(filter_path) if filter_path else None,
        "seed": seed,
    }
    # multi-host: the cursor is GLOBAL (all processes advance in lockstep
    # through the same claim plan), but resuming under a different
    # process topology would re-shard the keyspace mid-range — refuse.
    import jax
    if jax.process_count() > 1:
        key["procs"] = jax.process_count()
    return key


def process_local_path(path: str) -> str:
    """Per-process checkpoint file for multi-host runs.

    Every process holds the same global cursor, but two processes on a
    shared filesystem must not race tmp+rename on one file — suffix the
    path with the process index (single-process runs keep the path
    verbatim, so the common case is unchanged).

    Topology-change guard (both directions): a multi-host run refuses a
    checkpoint written under a different process count via the `procs`
    config key; symmetrically, a single-process run finding leftover
    `.pN` siblings of its path refuses instead of silently starting the
    whole range from offset 0."""
    import glob
    import jax
    if jax.process_count() > 1:
        return f"{path}.p{jax.process_index()}"
    stale = sorted(glob.glob(glob.escape(path) + ".p*"))
    if stale and not os.path.exists(path):
        raise ValueError(
            f"checkpoint {path} has per-process siblings from a "
            f"multi-host run ({', '.join(os.path.basename(s) for s in stale)}); "
            f"resuming single-process would restart from 0 — delete them "
            f"or re-run with the original process topology")
    return path


def reconcile_multihost(cursor: int, k_checked: int = 0,
                        k_found: int = 0) -> tuple[int, int, int]:
    """Multi-host resume reconciliation: per-process cursor files are
    saved on independent time-throttled cadences, so after a crash they
    can legitimately disagree — but every process MUST call run_range
    with the SAME start_offset or the lockstep shard_map/psum program
    diverges (different step counts across processes hang the
    collectives).  All processes allgather their (cursor, counters) and
    adopt the row with the MINIMUM cursor: re-searching a few keys is
    harmless, skipping keys is not.  Processes that found no checkpoint
    contribute cursor 0, which correctly restarts everyone.

    No-op (identity) for single-process runs."""
    import jax
    if jax.process_count() <= 1:
        return cursor, k_checked, k_found
    import numpy as np
    from jax.experimental import multihost_utils
    rows = multihost_utils.process_allgather(
        np.asarray([cursor, k_checked, k_found], dtype=np.int64))
    rows = np.asarray(rows).reshape(-1, 3)
    i = int(np.argmin(rows[:, 0]))
    return int(rows[i, 0]), int(rows[i, 1]), int(rows[i, 2])
