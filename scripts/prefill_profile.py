"""Prefill decomposition: where the gap to MXU peak lives.

Measures, slope-timed on device (methodology of bench.py):
  full    — one fresh-prefill forward (qwen3_forward, fresh_prefill=True)
  matmul  — the four projection matmuls per layer at the same row count,
            through the SAME rows kernels the prefill dispatch uses
  attn    — causal splash attention per layer at the same [B, S] shapes
  glue    — full − matmul − attn (norms, RoPE, reshapes, embed, head,
            cache writes, and any lost overlap)

With QWEN3_TPU_SPLASH_BLOCK the attention variant sweeps the splash
block edge (trace-time env read, distinct jits per setting).

Usage: python scripts/prefill_profile.py [model] [s] [blocks_csv]
  e.g. python scripts/prefill_profile.py 8b 4096 256,512,1024
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.models.qwen3 import cast_weight_scales, init_kv_cache, qwen3_forward
from qwen3_rs_tpu.testing import prefill_flops, qwen3_config, random_weights

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
blocks = [int(v) for v in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["512"])]

config = qwen3_config(model, seq_len=max(S, 1024))
weights = cast_weight_scales(random_weights(config))
PEAK = 197e12
L = config.n_layers


def slope(f_by_n, n_long=3, n_short=1):
    out = {}
    for n in (n_long, n_short):
        f = f_by_n(n)
        np.asarray(f())
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[n] = best
    return (out[n_long] - out[n_short]) / (n_long - n_short)


def full_maker(n):
    @jax.jit
    def run(w):
        cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
        tokens = jnp.ones((1, S), jnp.int32)
        logits = None
        for _ in range(n):
            logits, cache = qwen3_forward(
                config, w, tokens, cache, jnp.zeros(1, jnp.int32),
                mode="fast", fresh_prefill=True,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tokens = (tokens + nxt[:, None]) % config.vocab_size
        return logits

    return lambda: run(weights)


def matmul_maker(n):
    # The exact kernels the prefill dispatch routes big-row projections to.
    from qwen3_rs_tpu.ops import pallas as pallas_ops

    lw = weights.layers

    @jax.jit
    def run(w):
        lw = w.layers
        x = jnp.ones((S, config.dim), jnp.bfloat16)

        def layer(x, idx):
            a = pallas_ops.qmatmul_pallas_stacked_rows(x, lw.wqkv, idx)
            att = a[:, : config.all_heads_dim]
            o = pallas_ops.qmatmul_pallas_stacked_rows(att.astype(jnp.bfloat16), lw.wo, idx)
            h = pallas_ops.qmatmul_pallas_stacked_rows(o.astype(jnp.bfloat16), lw.w13, idx)
            y = pallas_ops.qmatmul_pallas_stacked_rows(
                h[:, : config.hidden_dim].astype(jnp.bfloat16), lw.w2, idx
            )
            return y.astype(jnp.bfloat16), ()

        out = x
        for _ in range(n):
            out, _ = jax.lax.scan(layer, out, jnp.arange(L))
        return out

    return lambda: run(weights)


def attn_maker(n):
    from qwen3_rs_tpu.ops.pallas.prefill_attention import causal_prefill_attention

    @jax.jit
    def run(w):
        q = jnp.ones((1, S, config.n_heads, config.head_dim), jnp.bfloat16)
        k = jnp.ones((1, S, config.n_kv_heads, config.head_dim), jnp.bfloat16)
        v = jnp.ones((1, S, config.n_kv_heads, config.head_dim), jnp.bfloat16)

        def layer(q, _):
            o = causal_prefill_attention(q, k, v)
            return o.astype(jnp.bfloat16), ()

        out = q
        for _ in range(n):
            out, _ = jax.lax.scan(layer, out, None, length=L)
        return out

    return lambda: run(weights)


flops = prefill_flops(config, S, 1)
print(f"model={model} S={S} layers={L} prefill_flops={flops / 1e12:.2f} TF", flush=True)

t_full = slope(full_maker)
print(f"  full:   {t_full * 1e3:8.1f} ms  {flops / t_full / 1e12:6.1f} TF/s "
      f"({flops / t_full / PEAK:.3f} of peak)", flush=True)

t_mm = slope(matmul_maker)
# matmul share of the model FLOPs (everything except attention scores/AV)
mm_flops = 2 * S * L * (
    config.dim * (config.all_heads_dim + 2 * config.kv_dim)
    + config.all_heads_dim * config.dim
    + config.dim * 2 * config.hidden_dim
    + config.hidden_dim * config.dim
)
print(f"  matmul: {t_mm * 1e3:8.1f} ms  {mm_flops / t_mm / 1e12:6.1f} TF/s "
      f"({mm_flops / t_mm / PEAK:.3f} of peak)", flush=True)

at_flops = 2 * 2 * L * (S * S / 2) * config.n_heads * config.head_dim
for b in blocks:
    os.environ["QWEN3_TPU_SPLASH_BLOCK"] = str(b)
    try:
        t_at = slope(attn_maker)
    finally:
        os.environ.pop("QWEN3_TPU_SPLASH_BLOCK", None)
    print(f"  attn(block={b}): {t_at * 1e3:8.1f} ms  "
          f"{at_flops / t_at / 1e12:6.1f} TF/s causal "
          f"({at_flops / t_at / PEAK:.3f} of peak)", flush=True)

t_glue = t_full - t_mm - t_at
print(f"  glue (full − matmul − attn@{blocks[-1]}): {t_glue * 1e3:8.1f} ms "
      f"({t_glue / t_full * 100:.1f}% of full)", flush=True)
