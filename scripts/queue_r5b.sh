#!/bin/bash
# Round-5 TPU queue, batch 2: patched INT4 decomposition, bracketed spec
# pairs (the first pair's arms landed in epochs 17% apart — epoch_gbs
# 680 vs 800; bracketing on/off in both orders bounds the multiplier),
# accuracy regen, and the family bench records with the epoch field.
set -u
mkdir -p /tmp/evidence_r5
cd "$(dirname "$0")/.."

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/evidence_r5/queue.log
  timeout "$t" "$@" >"/tmp/evidence_r5/$name.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)" | tee -a /tmp/evidence_r5/queue.log
  tail -8 "/tmp/evidence_r5/$name.log"
}

run q4_profile2 4800 python scripts/q4_profile.py 8b 48

run spec_parrot_off2 2400 env BENCH_CHILD=1 BENCH_MODE=serve BENCH_PARROT=1 BENCH_CYCLIC=1 BENCH_TEMP=0.0 BENCH_SLOTS=8 BENCH_REQUESTS=32 python bench.py
run spec_parrot_on2  2400 env BENCH_CHILD=1 BENCH_MODE=serve BENCH_PARROT=1 BENCH_SPEC=3 BENCH_SLOTS=8 BENCH_REQUESTS=32 python bench.py

run accuracy 3600 python scripts/accuracy_report.py /tmp/qacc_r5

run bench_4b   1500 env BENCH_CHILD=1 BENCH_MODEL=4b python bench.py
run bench_8b   1500 env BENCH_CHILD=1 python bench.py
run bench_06b  1200 env BENCH_CHILD=1 BENCH_MODEL=0.6b python bench.py
run bench_int4 1500 env BENCH_CHILD=1 BENCH_BITS=4 python bench.py
