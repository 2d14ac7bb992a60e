"""Decode-step ablation profiler: where does the non-roofline time go?

Slope-times (long vs short on-device ``lax.scan`` chunks, cancelling
dispatch + RTT) several variants of the single-stream decode step and
reports per-step ms + implied fraction of the HBM roofline:

  full      -- the real step: forward + greedy sample (bench.py parity)
  nohead    -- layers only: skip final norm + lm_head + argmax
  noattn    -- full step but attention replaced with an identity on q
  matsonly  -- bare scan of the four stacked qmatmul kernels (+ lm_head)

Deltas:  full - nohead       = classifier head + argmax cost
         full - noattn       = attention + cache scatter cost
         nohead - (matsonly-head) = per-layer XLA glue (norm/rope/residual)

Usage: python scripts/decode_profile.py [model] [seq_len] [steps]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

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

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
batch = int(os.environ.get("DP_BATCH", "1"))

n_layers = int(os.environ.get("DP_LAYERS", "0")) or None
config = qwen3_config(model, seq_len=seq_len, n_layers=n_layers)
weights = cast_weight_scales(random_weights(config))

HBM_BW = 819e9  # v5e
bytes_per_tok = weight_bytes_per_decode_token(config, scale_bytes=2)
roofline_ms = bytes_per_tok / HBM_BW * 1e3 / batch


def slope_time(make_fn, n_long, n_short):
    """Per-step seconds from the slope between two scan lengths."""
    out = {}
    for n in (n_long, n_short):
        f = make_fn(n)
        r = f()
        jax.tree.map(np.asarray, r)  # compile + warm (materialize = barrier)
        t0 = time.perf_counter()
        r = f()
        jax.tree.map(np.asarray, r)
        out[n] = time.perf_counter() - t0
    return (out[n_long] - out[n_short]) / (n_long - n_short)


def variant_step(kind):
    if kind == "noattn":
        os.environ["QWEN3_TPU_SKIP_ATTN"] = "1"

    def make(n):
        # Weights enter as a jit *argument* — closing over an 8 GB pytree
        # embeds it as compile-time constants and the compile never returns.
        @jax.jit
        def run(w):
            def body(carry, _):
                token, cache, pos = carry
                if kind in ("full", "noattn"):
                    logits, cache = qwen3_forward(
                        config, w, token, cache, pos, mode="fast"
                    )
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                else:  # nohead
                    logits, cache = qwen3_forward(
                        config, w, token, cache, pos, mode="fast", skip_head=True
                    )
                    nxt = (jnp.sum(logits) * 1e-30).astype(jnp.int32) + token
                return (nxt, cache, pos + 1), ()

            cache = init_kv_cache(config, batch=batch, dtype=jnp.bfloat16)
            tok = jnp.ones((batch, 1), jnp.int32)
            pos = jnp.zeros((batch,), jnp.int32)
            carry, _ = jax.lax.scan(body, (tok, cache, pos), None, length=n)
            return carry[0]

        return lambda: run(weights)

    return make


def matsonly_make(with_head):
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked
    from qwen3_rs_tpu.ops.matmul import qmatmul

    lw = weights.layers
    c = config

    def make(n):
        @jax.jit
        def run(lw, head):
            x0 = jnp.ones((batch, c.dim), jnp.float32)

            def tok_step(x, _):
                def layer(xc, idx):
                    qkv = qmatmul_pallas_stacked(xc, lw.wqkv, idx)
                    att = qkv[:, : c.all_heads_dim]
                    xc = xc + qmatmul_pallas_stacked(att, lw.wo, idx)
                    gu = qmatmul_pallas_stacked(xc, lw.w13, idx)
                    h = gu[:, : c.hidden_dim] * gu[:, c.hidden_dim :]
                    xc = xc + qmatmul_pallas_stacked(h, lw.w2, idx)
                    return xc, ()

                x, _ = jax.lax.scan(
                    layer, x, jnp.arange(c.n_layers, dtype=jnp.int32)
                )
                if with_head:
                    logits = qmatmul(x, head)
                    x = x + jnp.sum(logits, axis=-1, keepdims=True) * 1e-30
                return x * (1.0 + 1e-30), ()

            x, _ = jax.lax.scan(tok_step, x0, None, length=n)
            return x

        return lambda: run(weights.layers, weights.lm_head)

    return make


n_long, n_short = steps, max(steps // 4, 1)
variants = os.environ.get("DP_VARIANTS", "full,nohead,matsonly+head,matsonly").split(",")
print(f"model={model} b={batch} seq={seq_len} roofline={roofline_ms:.3f} ms/step",
      flush=True)
makers = {
    "full": lambda: variant_step("full"),
    "nohead": lambda: variant_step("nohead"),
    "matsonly+head": lambda: matsonly_make(True),
    "matsonly": lambda: matsonly_make(False),
}
for kind in variants:
    per = slope_time(makers[kind](), n_long, n_short)
    print(f"  {kind:>14}: {per * 1e3:7.3f} ms/step   "
          f"frac-of-roofline={roofline_ms / (per * 1e3):.3f}", flush=True)
