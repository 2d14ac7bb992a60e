"""Same-process INTERLEAVED prefill A/B (cancels relay epoch drift).

The round-4 xdot model sweep used adjacent bench pairs (cross-process),
which carries the session's ±4-5% drift band — the 1.7B w2 entry read
"wash / +5.4%", too fuzzy to justify its place inside the auto gate.
This harness traces one prefill program per env variant (the dispatch
reads QWEN3_TPU_PREFILL_XDOT at trace time), then INTERLEAVES the timed
runs A/B/A/B so drift hits both arms equally — the same methodology as
scripts/mega_ab.py for decode.

Timing: slope between k=3 and k=1 chained prefills inside single
dispatches (data-dependent chaining defeats DCE), min of REPS.

Usage:
  python scripts/prefill_ab.py 1.7b 4096 QWEN3_TPU_PREFILL_XDOT 0,w2
  python scripts/prefill_ab.py 8b 4096 QWEN3_TPU_PREFILL_XDOT 0,w2,big
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.models.qwen3 import (
    cast_weight_scales,
    init_kv_cache,
    qwen3_forward,
)
from qwen3_rs_tpu.testing import prefill_flops, qwen3_config, random_weights

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
s = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
key = sys.argv[3] if len(sys.argv) > 3 else "QWEN3_TPU_PREFILL_XDOT"
vals = (sys.argv[4] if len(sys.argv) > 4 else "0,w2").split(",")
bits = int(os.environ.get("PF_BITS", "8"))

config = qwen3_config(model, seq_len=s)
weights = cast_weight_scales(random_weights(config, bits=bits))
PEAK = 197e12
flops = prefill_flops(config, s, 1)


def make_fn(env_val, k):
    old = os.environ.get(key)
    os.environ[key] = env_val
    try:
        def prefill_k(weights, tokens, cache):
            logits = None
            for _ in range(k):
                logits, cache = qwen3_forward(
                    config, weights, tokens, cache, jnp.zeros(1, jnp.int32),
                    mode="fast", fresh_prefill=True,
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tokens = (tokens + nxt[:, None]) % config.vocab_size
            return logits

        f = jax.jit(prefill_k, donate_argnums=(2,))
        cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
        tokens = jnp.ones((1, s), jnp.int32)
        np.asarray(f(weights, tokens, cache))  # compile + warm
        return f
    finally:
        if old is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = old


fns = {}
for v in vals:
    fns[v] = {k: make_fn(v, k) for k in (1, 3)}
    print(f"compiled: {key}={v}", flush=True)

REPS = 4
times = {v: {k: [] for k in (1, 3)} for v in vals}
for _ in range(REPS):
    for k in (1, 3):
        for v in vals:
            cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
            tokens = jnp.ones((1, s), jnp.int32)
            t0 = time.perf_counter()
            np.asarray(fns[v][k](weights, tokens, cache))
            times[v][k].append(time.perf_counter() - t0)

print(f"model={model} s={s} bits={bits} (interleaved, slope k=3..1, min of {REPS})")
for v in vals:
    per = (min(times[v][3]) - min(times[v][1])) / 2
    print(
        f"  {key}={v:>5}: {per * 1e3:8.2f} ms/prefill "
        f"({flops / per / 1e12:6.1f} TF/s, frac={flops / per / PEAK:.4f})",
        flush=True,
    )
