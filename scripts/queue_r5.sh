#!/bin/bash
# Round-5 serial TPU measurement queue (one job at a time; the chip is
# single-tenant and timed sections must not overlap).  Logs land in
# /tmp/evidence_r5/.
set -u
mkdir -p /tmp/evidence_r5
cd "$(dirname "$0")/.."

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/evidence_r5/queue.log
  timeout "$t" "$@" >"/tmp/evidence_r5/$name.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)" | tee -a /tmp/evidence_r5/queue.log
  tail -12 "/tmp/evidence_r5/$name.log"
}

# INT4 decode decomposition (VERDICT item 3)
run q4_profile 3600 python scripts/q4_profile.py 8b 48

# Speculative multiplier demo on the TPU (VERDICT item 4): parrot weights,
# spec-on vs spec-off on identical cyclic traffic
run spec_parrot_on  2400 env BENCH_CHILD=1 BENCH_MODE=serve BENCH_PARROT=1 BENCH_SPEC=3 BENCH_SLOTS=8 BENCH_REQUESTS=32 python bench.py
run spec_parrot_off 2400 env BENCH_CHILD=1 BENCH_MODE=serve BENCH_PARROT=1 BENCH_CYCLIC=1 BENCH_TEMP=0.0 BENCH_SLOTS=8 BENCH_REQUESTS=32 python bench.py

# Prefill weight-stationary candidates (VERDICT item 5)
run rows_ws 3600 python scripts/rows_tile_calibrate.py 4096

# xdot 1.7B interleaved re-measure (VERDICT item 7)
run xdot_17b 2400 python scripts/prefill_ab.py 1.7b 4096 QWEN3_TPU_PREFILL_XDOT 0,w2
