#!/bin/bash
# Round-4 evidence queue: sequential timeboxed TPU jobs, one log per job
# (the chip admits one process at a time — see tpu-relay notes).  Collect
# with scripts/collect_evidence.py or by reading /tmp/evidence_r4/*.log.
set -u
OUT=/tmp/evidence_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  ( timeout "$tmo" env "$@" > "$OUT/$name.log" 2>&1; echo "rc=$?" >> "$OUT/$name.log" )
  tail -c 400 "$OUT/$name.log"; echo
}

# INT4 decode at 8B, bench methodology (cross-check vs the r3 129 number)
run int4_8b 580 BENCH_BITS=4 BENCH_CHILD=1 python bench.py

# Serving: bf16 16 slots baseline, INT8 pool at 16 and 32 slots (the slot
# ceiling bf16 cannot reach: 32 slots bf16 needs 18.8 GB > 15.75 GB HBM)
run serve16_bf16 1500 BENCH_MODE=serve BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_CHILD=1 python bench.py
run serve16_int8 1500 BENCH_MODE=serve BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_KV=int8 BENCH_CHILD=1 python bench.py
run serve32_int8 1800 BENCH_MODE=serve BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_KV=int8 BENCH_CHILD=1 python bench.py

# Speculation A/B with the acceptance-adaptive policy: spec-on must be
# >= spec-off at BOTH temperatures now (r3: 414 vs 433 at t=0.8).
# BENCH_CYCLIC=1 keeps the prompt distribution identical on both arms.
run spec_off_t0 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_TEMP=0.0 BENCH_CYCLIC=1 BENCH_CHILD=1 python bench.py
run spec_on_t0 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=3 BENCH_CHILD=1 python bench.py
run spec_off_t08 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_TEMP=0.8 BENCH_CYCLIC=1 BENCH_CHILD=1 python bench.py
run spec_on_t08 1500 BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=3 BENCH_TEMP=0.8 BENCH_CHILD=1 python bench.py

# Long-context INT8-KV regression (r3: 83 tok/s at 16k)
run ctx16k_int8 580 BENCH_SEQ_LEN=16384 BENCH_START_POS=15360 BENCH_KV=int8 BENCH_STEPS=32 BENCH_CHILD=1 python bench.py

# Decode decomposition at 8B post-changes
run megaprof_8b 900 python scripts/mega_profile.py 8b 1024 48 512

# Greedy epilogue at 0.6B under unroll=4 (parity + perf)
run greedy_ab_06b 580 python scripts/greedy_ab.py 0.6b

# Prefill matmul-rate lever: rows-kernel tile calibration at 4096 rows
# (the decomposition pinned prefill on the 115 TF/s matmul rate, not glue)
run rows_tiles_4096 1500 python scripts/rows_tile_calibrate.py 4096

# Splash block 2048 probe (1024 already measured 110.5 TF/s vs 91.3 @ 512)
run prefill_blk2048 900 python scripts/prefill_profile.py 8b 4096 1024,2048

# Accuracy artifact (bound-anchored + logit-KL, vocab-4096 fixture)
run accuracy 1800 python scripts/accuracy_report.py /tmp/qacc_r4

echo "ALL DONE ($(date +%H:%M:%S))"
