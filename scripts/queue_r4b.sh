#!/bin/bash
# Round-4 follow-up queue: fixes + reruns from the first evidence pass.
set -u
OUT=/tmp/evidence_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  ( timeout "$tmo" env "$@" > "$OUT/$name.log" 2>&1; echo "rc=$?" >> "$OUT/$name.log" )
  tail -c 500 "$OUT/$name.log"; echo
}

# 32-slot INT8 pool with the warmup ladder capped at the bench's actual
# prompt widths (the uncapped ladder OOM'd: group-32 prefills at 4096-wide
# buckets allocate multi-GB temps during warmup)
run serve32_int8 1800 BENCH_MODE=serve BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_KV=int8 QWEN3_TPU_WARMUP_LADDER_MAX=128 BENCH_CHILD=1 python bench.py

# Spec reruns with the adaptive-policy fields in the output line
run spec_on_t0_v2 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=3 BENCH_CHILD=1 python bench.py
run spec_on_t08_v2 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=3 BENCH_TEMP=0.8 BENCH_CHILD=1 python bench.py

# Q4 op-sequence A/B on identical bytes: historical shift vs biased int
run q4_shift_ab 580 python scripts/mega_ab.py 8b q4env QWEN3_TPU_Q4_UNPACK int,shift

# Rows-kernel tile calibration at 4096 rows (import path fixed)
run rows_tiles_4096 1500 python scripts/rows_tile_calibrate.py 4096

echo "ALL DONE ($(date +%H:%M:%S))"
