#!/usr/bin/env bash
# Round-3 queue #4: same-process A/Bs for the attention-boundary prefetch
# and Q4 megakernel tile budget; prefix-serve retry with the fused-
# estimate headroom fix.
set -u
mkdir -p /tmp/evidence
cd /root/repo

for _ in $(seq 1 720); do
  grep -q "queue3 done" /tmp/evidence/queue3.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

run mega_ab_prefetch_8b 1800 python scripts/mega_ab.py 8b attn_prefetch
run mega_ab_prefetch_06b 1500 python scripts/mega_ab.py 0.6b attn_prefetch
run mega_ab_q4tiles_8b 2400 python scripts/mega_ab.py 8b q4tiles
run serve_prefix_on3 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py
run serve_prefix_off2 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=nocache python bench.py

echo "=== queue4 done ($(date +%H:%M:%S)) ==="
