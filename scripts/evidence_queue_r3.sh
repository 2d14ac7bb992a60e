#!/usr/bin/env bash
# Round-3 evidence queue: every measurement VERDICT r2 asked to see
# committed.  Sequential (one TPU chip); each step timeboxed; failures
# don't stop the queue.  Results land in /tmp/evidence/*.log and are
# post-processed into committed artifacts (ACCURACY.json, EVIDENCE.md,
# README perf table).
set -u
mkdir -p /tmp/evidence
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

# -- megakernel real-dims parity gate (fast-fail before long benches) --
run mega_parity 1200 python scripts/mega_parity_tpu.py 0.6b

# -- flagship 8B decode (fresh container: first compiles are slow) --
run bench_8b 1800 python bench.py

# -- task #5: 0.6B decode with the megakernel --
run bench_06b 720 env BENCH_MODEL=0.6b python bench.py

# -- task #3 done-criteria: b=1 16k-context decode, INT8 vs bf16 KV --
run bench_8b_ctx15k_int8 900 env BENCH_KV=int8 BENCH_START_POS=15000 BENCH_SEQ_LEN=16384 BENCH_STEPS=48 python bench.py
run bench_8b_ctx15k_bf16 900 env BENCH_START_POS=15000 BENCH_SEQ_LEN=16384 BENCH_STEPS=48 python bench.py

# -- task #4: serve A/B artifacts --
run serve_paged 1200 env BENCH_MODE=serve BENCH_SLOTS=8 python bench.py
run serve_dense_mega 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SERVE_KV=dense python bench.py
run serve_spec4 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=4 python bench.py
run serve_spec4_t08 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=4 BENCH_TEMP=0.8 python bench.py
run serve_prefix_on 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py
run serve_prefix_off 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=nocache python bench.py

# -- task #6: W8A16 vs W8A8 prefill A/B at 8B shapes --
run prefill_a8_ab 1800 python scripts/prefill_a8_ab.py 8b 256,512,1024,2048,4096

# -- task #7: where do the remaining decode points live --
run mega_profile_8b 1500 python scripts/mega_profile.py 8b 1024 64 512
run mega_profile_06b 1200 python scripts/mega_profile.py 0.6b 1024 256 512

# -- task #4: accuracy report (ppl deltas + golden streams) --
run accuracy 3000 python scripts/accuracy_report.py /tmp/qacc

# -- prefill latency refresh for the README table --
run prefill_1k 700 env BENCH_MODE=prefill BENCH_MODEL=8b BENCH_PREFILL_LEN=1024 python bench.py
run prefill_2k 700 env BENCH_MODE=prefill BENCH_MODEL=8b BENCH_SEQ_LEN=2048 BENCH_PREFILL_LEN=2048 python bench.py
run prefill_4k 700 env BENCH_MODE=prefill BENCH_MODEL=8b BENCH_SEQ_LEN=4096 BENCH_PREFILL_LEN=4096 python bench.py

echo "=== queue done ($(date +%H:%M:%S)) ==="
