#!/bin/bash
# One-shot TPU evidence pack (VERDICT r2 #4): run the golden vectors,
# the device test subset, and the benches on the live TPU, writing raw
# logs to $OUT and regenerating TPU_RESULTS.md after EVERY stage so a
# tunnel drop mid-pack still leaves a valid partial artifact.
#
# Stage order = CORRECTNESS FIRST (VERDICT r3 weak #8: round 3 ran the
# headline bench first and exhausted its window before the correctness
# stages — exactly the stages that prove HEAD is right on device).  The
# cheap golden vectors and the device pytest subset run before any
# bench; the benches re-run last and overwrite BENCH_LAST_GOOD.json.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_evidence}
mkdir -p "$OUT"
: > "$OUT/log"

report() {
  python tools/tpu_evidence.py "$OUT" > TPU_RESULTS.md 2>/dev/null || true
}

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" >> "$OUT/log"
  timeout -k 30 "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name" >> "$OUT/log"
  report
}

run device 300 python -c "import jax,sys; d=jax.devices(); print(d[0].platform, d[0].device_kind, len(d), 'jax', jax.__version__)"

# 1. golden add vector: 9 keys / 16,777,216 checked (reference make add)
run add_vector 1500 python -m ecloop_tpu add -f data/btc-puzzles-hash \
  -r 8000:ffffff -q -o "$OUT/add_found.txt"

# 2. golden mul vector: 1080 keys (reference make mul).  2700 s: the
# cold mul-step compile through the remote relay alone can take >20 min
# (the r4 first attempt hit rc=124 at 1800 s with the unrolled XLA hash
# still inlined).
run mul_vector 2700 bash -c "cat data/btc-bw-priv | python -m ecloop_tpu \
  mul -f data/btc-bw-hash -a cu -q -o '$OUT/mul_found.txt'"

# 3. bloom round-trip (reference make blf)
run blf_roundtrip 1800 bash -c "
  rm -f /tmp/ecloop-ev.blf '$OUT/blf_add_found.txt' &&
  cat data/btc-puzzles-hash data/btc-bw-hash |
    python -m ecloop_tpu blf-gen -n 32768 -o /tmp/ecloop-ev.blf &&
  python -m ecloop_tpu add -f /tmp/ecloop-ev.blf -r 8000:ffffff -q \
    -o '$OUT/blf_add_found.txt'"

# 4. device test subset incl. the TPU-only forms (Pallas, unrolled fel)
#    and the tiny-geometry engine drain (the r3 contiguity-crash shape)
ECLOOP_TEST_TPU=1 run tpu_tests 2400 python -m pytest \
  tests/test_tpu_variants.py tests/test_golden.py tests/test_sol.py \
  tests/test_benchcli.py -q

# 5. headline bench -> BENCH_LAST_GOOD.json (incl. mul + sharding stages)
ECLOOP_BENCH_BUDGET_S=${ECLOOP_BENCH_BUDGET_S:-1500} \
  run bench 1600 python bench.py

# 6. per-kernel microbench + 7. gtable width sweep
run bench_micro 1800 python -m ecloop_tpu bench
ECLOOP_GTABLE_WS="${ECLOOP_GTABLE_WS:-8 10 12 14 16 18 20}" \
  run bench_gtable 3000 python -m ecloop_tpu bench-gtable

report
echo "evidence pack complete; see TPU_RESULTS.md and $OUT/"
