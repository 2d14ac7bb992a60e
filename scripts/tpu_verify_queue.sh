#!/usr/bin/env bash
# TPU verification queue — the standing check-list after kernel/serving
# changes.  Each step is independently timeboxed; failures don't stop the
# queue.  Results land in /tmp/tpuq/*.log .
set -u
mkdir -p /tmp/tpuq
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/tpuq/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/tpuq/$name.log" | tail -1 | head -c 200))"
}

# 0. relay sanity
run probe 240 python -c "import jax, jax.numpy as jnp, numpy as np; print(jax.devices()); print(np.asarray(jnp.ones(8)*2)[:2])"

# 1. megakernel parity at real dims (Mosaic lowering + production tiles —
#    CI only covers tiny interpret-mode dims)
run mega_parity 1500 python scripts/mega_parity_tpu.py 0.6b

# 2. flagship decode benches
run bench_8b 1500 python bench.py
run bench_06b 900 env BENCH_MODEL=0.6b python bench.py
run bench_8b_int4 1500 env BENCH_BITS=4 python bench.py
run bench_8b_ctx15k_int8 900 env BENCH_KV=int8 BENCH_START_POS=15000 BENCH_SEQ_LEN=16384 BENCH_STEPS=48 python bench.py

# 3. graft entry
run graft_entry 900 python __graft_entry__.py

# 4. serving surfaces (paged kernels, megakernel dense decode, prefix cache)
run serve_paged 1500 env BENCH_MODE=serve BENCH_SLOTS=8 python bench.py
run serve_dense_mega 1500 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SERVE_KV=dense python bench.py
run serve_prefix 1800 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py

# 5. prefill latency
run prefill_4k 900 env BENCH_MODE=prefill BENCH_MODEL=8b BENCH_SEQ_LEN=4096 BENCH_PREFILL_LEN=4096 python bench.py

echo "=== queue done ($(date +%H:%M:%S)) ==="
