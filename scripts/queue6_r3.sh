#!/usr/bin/env bash
# Round-3 queue #6: Q4 unpack rewrite A/B, A8 fori-loop sweep, prefix
# serve with ladder warmup, 0.6B with attn prefetch.
set -u
mkdir -p /tmp/evidence
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

# Q4 decode with the shift-based unpack: megakernel vs per-matrix
run mega_ab_q4_v2 2400 python scripts/mega_ab.py 8b q4tiles 2097152,1048576

# W8A16 vs W8A8 complete sweep (fori-loop kernel)
run prefill_a8_ab4 2400 python scripts/prefill_a8_ab.py 8b 512,1024,2048,4096

# prefix serve A/B with ladder warmup (compiles now land in warmup)
run serve_prefix_on4 1800 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py
run serve_prefix_off3 1800 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=nocache python bench.py

# 0.6B flagship with attention-boundary prefetch (default ON)
run bench_06b_final 900 env BENCH_MODEL=0.6b python bench.py

echo "=== queue6 done ($(date +%H:%M:%S)) ==="
