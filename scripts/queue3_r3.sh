#!/usr/bin/env bash
# Round-3 queue #3: re-measurements after the wo-prefetch megakernel, the
# A8 tile-picker fix, and the prefill bucket ladder.  Waits for the
# follow-up queue to finish.
set -u
mkdir -p /tmp/evidence
cd /root/repo

for _ in $(seq 1 720); do
  grep -q "followup done" /tmp/evidence/followup.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

# INT8 flagship + 0.6B with the wo-prefetch kernel
run bench_8b_wopre 1500 python bench.py
run bench_06b_wopre 900 env BENCH_MODEL=0.6b python bench.py

# W8A16 vs W8A8 prefill A/B (fixed A8 tile picker)
run prefill_a8_ab2 2400 python scripts/prefill_a8_ab.py 8b 512,1024,2048,4096

# accuracy report (exact path runs the fixed A8 kernel)
run accuracy2 3600 python scripts/accuracy_report.py /tmp/qacc

# prefill 2k with the right window
run prefill_2k2 700 env BENCH_MODE=prefill BENCH_MODEL=8b BENCH_SEQ_LEN=2048 BENCH_PREFILL_LEN=2048 python bench.py

echo "=== queue3 done ($(date +%H:%M:%S)) ==="
