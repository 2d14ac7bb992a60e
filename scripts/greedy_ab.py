"""Same-process A/B: fused greedy argmax epilogue vs XLA argmax.

Interleaved timing (mega_ab.py methodology — cancels relay drift) of the
bench decode loop with greedy_head=True (megakernel argmax epilogue, no
logit materialization) vs False (fused-head logits + XLA argmax in the
scan body).

Usage: python scripts/greedy_ab.py [model] [steps_long]
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
from qwen3_rs_tpu.testing import (
    qwen3_config,
    random_weights,
    weight_bytes_per_decode_token,
)

model = sys.argv[1] if len(sys.argv) > 1 else "0.6b"
STEPS = (int(sys.argv[2]) if len(sys.argv) > 2 else 192, 48)
SEQ = 1024
config = qwen3_config(model, seq_len=SEQ)
weights = cast_weight_scales(random_weights(config))
roofline_ms = weight_bytes_per_decode_token(config, scale_bytes=2) / 819e9 * 1e3


def make_fn(greedy: bool, n_steps: int):
    def decode_n(w, token, cache, pos):
        def body(carry, _):
            token, cache, pos = carry
            if greedy:
                nxt, cache = qwen3_forward(
                    config, w, token, cache, pos, mode="fast", greedy_head=True
                )
                nxt = nxt[:, None]
            else:
                logits, cache = qwen3_forward(
                    config, w, token, cache, pos, mode="fast"
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache, pos + 1), nxt

        carry, toks = jax.lax.scan(body, (token, cache, pos), None, length=n_steps)
        return toks, carry[1]

    f = jax.jit(decode_n, donate_argnums=(2,))
    cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
    tok = jnp.ones((1, 1), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    np.asarray(f(weights, tok, cache, pos)[0])  # compile + warm
    return f


fns = {}
for greedy in (True, False):
    label = "greedy-epilogue" if greedy else "xla-argmax"
    fns[label] = {n: make_fn(greedy, n) for n in STEPS}
    print(f"compiled: {label}", flush=True)

# Token parity first: both must emit the same stream.
toks = {}
for label, by_n in fns.items():
    cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
    toks[label], _ = by_n[STEPS[1]](
        weights, jnp.ones((1, 1), jnp.int32), cache, jnp.zeros((1,), jnp.int32)
    )
    toks[label] = np.asarray(toks[label]).ravel()
same = bool((toks["greedy-epilogue"] == toks["xla-argmax"]).all())
print(f"token parity over {STEPS[1]} steps: {'OK' if same else 'MISMATCH'}", flush=True)

REPS = 3
times = {label: {n: [] for n in STEPS} for label in fns}
for _ in range(REPS):
    for n in STEPS:
        for label, by_n in fns.items():
            cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
            tok = jnp.ones((1, 1), jnp.int32)
            pos = jnp.zeros((1,), jnp.int32)
            t0 = time.perf_counter()
            np.asarray(by_n[n](weights, tok, cache, pos)[0])
            times[label][n].append(time.perf_counter() - t0)

print(f"model={model} roofline={roofline_ms:.3f} ms/step")
for label in times:
    t_long = min(times[label][STEPS[0]])
    t_short = min(times[label][STEPS[1]])
    per = (t_long - t_short) / (STEPS[0] - STEPS[1])
    print(
        f"  {label:>16}: {per * 1e3:7.3f} ms/step "
        f"({1.0 / per:7.1f} tok/s, frac={roofline_ms / (per * 1e3):.4f})",
        flush=True,
    )
if not same:
    sys.exit(1)
