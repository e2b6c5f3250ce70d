"""Assemble TPU_RESULTS.md from a tools/tpu_evidence.sh output directory.

Each evidence stage writes <name>.log plus an `rc=<n> <name>` line in
`log`; this script renders them into the committed evidence artifact
(VERDICT r2 #4: README perf/correctness claims must cite raw, in-repo
TPU runs).  Safe to run mid-pack: stages not yet run are listed as
pending, so a partially-completed pack still yields a valid report.
"""

from __future__ import annotations

import os
import re
import sys
import time

STAGES = [
    ("add_vector", "golden add vector: 9 keys over -r 8000:ffffff"),
    ("mul_warm", "mul graph cold compile into the persistent cache"),
    ("mul_vector", "golden mul vector: 1080 keys from data/btc-bw-priv"),
    ("rnd_vector", "rnd mode on device: seeded full-range pass finds 9 keys"),
    ("blf_roundtrip", "blf-gen + search through the .blf path"),
    ("blf_interchange", "cross-tool ECBF interchange vs the reference C binary"),
    ("tests_variants", "pytest tests/test_tpu_variants.py on device"),
    ("tests_golden", "pytest tests/test_golden.py on device"),
    ("tests_sol", "pytest tests/test_sol.py on device"),
    ("tests_benchcli", "pytest tests/test_benchcli.py on device"),
    ("bench", "bench.py headline incl. mul + sharding stages "
              "(writes BENCH_LAST_GOOD.json)"),
    ("bench_micro", "per-kernel microbench (bench cmd)"),
    ("bench_gtable", "gtable width sweep (bench-gtable)"),
    ("scaling_virtual", "sharding overhead, 1/2/4/8-device virtual mesh"),
]

MAX_LINES = 60


def _tail(path: str, n: int = MAX_LINES) -> str:
    try:
        with open(path, errors="replace") as f:
            lines = f.read().splitlines()
    except OSError:
        return "(no log)"
    body = lines if len(lines) <= n else (
        [f"... ({len(lines) - n} lines elided)"] + lines[-n:])
    return "\n".join(body)


def main(out_dir: str) -> int:
    rcs = {}
    commits = {}
    log_path = os.path.join(out_dir, "log")
    if os.path.exists(log_path):
        for line in open(log_path):
            m = re.match(r"rc=(\d+) (\S+)(?: @(\S+))?", line)
            if m:
                rcs[m.group(2)] = int(m.group(1))
                if m.group(3):
                    commits[m.group(2)] = m.group(3)

    dev = _tail(os.path.join(out_dir, "device.log"), 5)
    parts = [
        "# TPU evidence pack",
        "",
        f"Captured: {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} "
        f"(UTC) on the live device via tools/tpu_evidence.sh.",
        "Raw per-stage logs below are verbatim; exit codes per stage.",
        "",
        "## Device",
        "```",
        dev,
        "```",
        "",
        "## Stages",
        "",
        "| stage | what | rc | commit |",
        "|---|---|---|---|",
    ]
    for name, desc in STAGES:
        rc = rcs.get(name)
        status = "pending" if rc is None else ("ok" if rc == 0 else f"FAIL({rc})")
        parts.append(f"| {name} | {desc} | {status} | "
                     f"{commits.get(name, '—')} |")
    parts.append("")
    for name, desc in STAGES:
        if rcs.get(name) is None:
            continue
        stamp = commits.get(name)
        head = f"## {name} — {desc} (rc={rcs[name]}" + (
            f", @{stamp})" if stamp else ")")
        parts += [head, "```",
                  _tail(os.path.join(out_dir, f"{name}.log")), "```", ""]
    # found-key files, the actual correctness payload
    for fname, want in (("add_found.txt", 9), ("mul_found.txt", 1080),
                        ("blf_add_found.txt", 9), ("rnd_found.txt", 9)):
        p = os.path.join(out_dir, fname)
        if os.path.exists(p):
            n = sum(1 for _ in open(p))
            parts += [f"## {fname}: {n} found keys (expect {want}) — "
                      f"{'MATCH' if n == want else 'MISMATCH'}", "```",
                      _tail(p, 15), "```", ""]
    print("\n".join(parts))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_evidence"))
