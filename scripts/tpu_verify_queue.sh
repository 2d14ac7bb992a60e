#!/usr/bin/env bash
# TPU verification queue — run when the axon relay comes back up.
# Each step is independently timeboxed; failures don't stop the queue.
# Results land in /tmp/tpuq/*.log .
set -u
mkdir -p /tmp/tpuq
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/tpuq/$name.log" 2>&1
  echo "$name: exit $? ($(tail -1 "/tmp/tpuq/$name.log" | head -c 200))"
}

# 0. relay sanity
run probe 240 python -c "import jax, jax.numpy as jnp, numpy as np; print(jax.devices()); print(np.asarray(jnp.ones(8)*2)[:2])"

# 1. flagship decode (regression check: paged-flash change must not touch b1 dense)
run bench_decode 720 python bench.py

# 2. graft entry
run graft_entry 600 python __graft_entry__.py

# 3. paged attention kernel vs XLA gather (b8, pos 1024), bf16 + int8 pools
run paged_attn_bf16 900 python scripts/paged_attn_microbench.py 8b both
run paged_attn_int8 900 env PB_INT8=1 python scripts/paged_attn_microbench.py 8b both

# 3b. window-kernel variant (speculative verify shapes)
run paged_attn_window 900 env PB_S=5 python scripts/paged_attn_microbench.py 8b both

# 4. serve bench with the new kernel (paged, 8 slots) and kernel off (A/B)
run serve_kernel 1200 env BENCH_MODE=serve BENCH_SLOTS=8 python bench.py
run serve_nokernel 1200 env BENCH_MODE=serve BENCH_SLOTS=8 QWEN3_TPU_DISABLE_PAGED_FLASH=1 python bench.py

# 4b. speculative serving (greedy cyclic prompts = favorable acceptance)
run serve_spec 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=4 python bench.py

# 4c. stochastic speculative serving (sampled acceptance, temp 0.8)
run serve_spec_t08 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_SPEC=4 BENCH_TEMP=0.8 python bench.py

# 4d. prefix caching A/B (shared 192-token preamble; TTFT + tok/s)
run serve_prefix 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=1 python bench.py
run serve_prefix_off 1200 env BENCH_MODE=serve BENCH_SLOTS=8 BENCH_PREFIX=nocache python bench.py

# 5. INT4 verification debt: decode bench + kernel microbench
run int4_decode 900 env BENCH_BITS=4 python bench.py
run int4_microbench 900 env MB_BITS=4 python scripts/kernel_microbench.py 8b

# 6. speculative decode on a repetitive prompt (greedy; expect >1x)
run spec_smoke 700 python - <<'EOF'
import numpy as np, time
from qwen3_rs_tpu.utils import enable_compile_cache
enable_compile_cache()
from qwen3_rs_tpu.testing import qwen3_config, random_weights
from qwen3_rs_tpu.inference.engine import Engine
cfg = qwen3_config("8b", seq_len=1024)
eng = Engine(config=cfg, weights=random_weights(cfg), mode="fast")
prompt = ([11, 22, 33, 44] * 8)
cache = eng.new_cache(1)
logits, cache = eng.prefill(cache, np.asarray([prompt], np.int32), np.zeros(1, np.int32))
cur = int(np.argmax(np.asarray(logits)[0]))
hist = np.asarray(prompt + [cur], np.int32)
# warm
toks, counts, cache = eng.decode_chunk_spec(cache, cur, len(prompt), 4, 4, hist)
t0 = time.time()
toks, counts, cache = eng.decode_chunk_spec(cache, cur, len(prompt)+int(counts.sum()), 16, 4, hist)
emitted = int(np.asarray(counts).sum())
dt = time.time() - t0
print(f"spec: {emitted} tokens in 16 rounds, {dt*1e3:.0f} ms, {emitted/dt:.1f} tok/s, counts={np.asarray(counts).tolist()}")
EOF

echo "=== queue done ($(date +%H:%M:%S)) ==="
