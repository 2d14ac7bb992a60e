#!/usr/bin/env bash
# Round-3 follow-up queue: reruns of the fixed paths + the INT4 megakernel
# measurements.  Waits for the main evidence queue to finish, then runs.
set -u
mkdir -p /tmp/evidence
cd /root/repo

# Wait (up to 2 h) for the main queue's completion marker.
for _ in $(seq 1 720); do
  grep -q "queue done" /tmp/evidence/queue.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

# megakernel real-dims parity, drift-aware thresholds
run mega_parity2 1500 python scripts/mega_parity_tpu.py 0.6b

# prefix-caching serve A/B rerun (scoped-VMEM tile fix)
run serve_prefix_on2 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py

# INT4 megakernel: flagship single-stream decode + megakernel-off A/B
run bench_8b_int4 1500 env BENCH_BITS=4 python bench.py
run bench_8b_int4_nomega 1500 env BENCH_BITS=4 QWEN3_TPU_DISABLE_MEGAKERNEL=1 python bench.py

# INT4 weights + INT8 KV at 16k: the combined long-context flagship
run bench_8b_int4_ctx15k_int8kv 1200 env BENCH_BITS=4 BENCH_KV=int8 BENCH_START_POS=15000 BENCH_SEQ_LEN=16384 BENCH_STEPS=48 python bench.py

# 0.6B INT4 (fixed costs dominate more; data point for the table)
run bench_06b_int4 900 env BENCH_MODEL=0.6b BENCH_BITS=4 python bench.py

echo "=== followup done ($(date +%H:%M:%S)) ==="
