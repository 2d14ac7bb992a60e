#!/usr/bin/env bash
# Round-3 queue #8: Q4 decode A/B with the int32-shift unpack.
set -u
mkdir -p /tmp/evidence
cd /root/repo

for _ in $(seq 1 720); do
  grep -q "queue7 done" /tmp/evidence/queue7.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

run mega_ab_q4_v3 2400 python scripts/mega_ab.py 8b q4tiles 2097152,1048576

# W8A16 vs W8A8 sweep, groups-per-tile-bounded unrolled kernel
run prefill_a8_ab5 2400 python scripts/prefill_a8_ab.py 8b 512,1024,2048,4096

# Clean TTFT: 8 requests into 8 slots (no queue wait) — the README's
# "p50 TTFT at 8 concurrent requests" line.
run serve_ttft8 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_REQUESTS=8 python bench.py

echo "=== queue8 done ($(date +%H:%M:%S)) ==="
