"""Megakernel ablation: kernel-only step time vs the full decode step.

Isolates where the decode step's remaining non-roofline time lives:
  full      — qwen3_forward + argmax, dynamic scan-carried position
              (bench.py parity; megakernel engaged)
  fullfixed — same with the position frozen (isolates loop-varying costs)
  megaonly  — the raw megakernel call chained through x + cache (fused
              head, in-kernel KV writes, dynamic pos)
  megabody  — megaonly without the fused head phase

Usage: python scripts/mega_profile.py [model] [seq_len] [steps] [pos]
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

from qwen3_rs_tpu.models.qwen3 import (
    cast_weight_scales,
    init_kv_cache,
    qwen3_forward,
)
from qwen3_rs_tpu.ops.pallas.megakernel import decode_stack_megakernel
from qwen3_rs_tpu.ops.rope import rope_table
from qwen3_rs_tpu.testing import (
    qwen3_config,
    random_weights,
    weight_bytes_per_decode_token,
)

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
fixed_pos = int(sys.argv[4]) if len(sys.argv) > 4 else 512

config = qwen3_config(model, seq_len=seq_len)
weights = cast_weight_scales(random_weights(config))
HBM_BW = 819e9
roofline_ms = weight_bytes_per_decode_token(config, scale_bytes=2) / HBM_BW * 1e3


def slope(fn_maker, n_long, n_short):
    out = {}
    for n in (n_long, n_short):
        f = fn_maker(n)
        np.asarray(f())
        t0 = time.perf_counter()
        np.asarray(f())
        out[n] = time.perf_counter() - t0
    return (out[n_long] - out[n_short]) / (n_long - n_short)


def full_maker(fixed=False):
    def maker(n):
        @jax.jit
        def run(w):
            cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
            tok = jnp.ones((1, 1), jnp.int32)
            pos0 = jnp.full((1,), fixed_pos, jnp.int32)

            def body(carry, _):
                token, cache, pos = carry
                logits, cache = qwen3_forward(
                    config, w, token, cache, pos0 if fixed else pos, mode="fast"
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return (nxt, cache, pos + 1), ()

            carry, _ = jax.lax.scan(body, (tok, cache, pos0), None, length=n)
            return carry[0]

        return lambda: run(weights)

    return maker


def mega_maker(with_head, fixed=True):
    cos_t, sin_t = rope_table(seq_len, config.head_dim, config.rope_theta)
    pos0 = jnp.full((1,), fixed_pos, jnp.int32)
    cos, sin = cos_t[pos0], sin_t[pos0]

    def maker(n):
        @jax.jit
        def run(w):
            lw = w.layers
            cache0 = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
            x0 = jnp.ones((1, config.dim), jnp.float32)

            def body(carry, _):
                x, k, v, pos = carry
                x_out, (k, v), logits = decode_stack_megakernel(
                    config, x, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
                    cos, sin, lw.wqkv, lw.wo, lw.w13, lw.w2,
                    k, v, pos0 if fixed else pos,
                    w.rms_final if with_head else None,
                    w.lm_head if with_head else None,
                    eps=config.norm_eps,
                )
                extra = jnp.sum(logits) if with_head else 0.0
                x = x_out * 0.5 + extra * 1e-30
                return (x, k, v, pos + 1), ()

            carry, _ = jax.lax.scan(
                body, (x0, cache0.k, cache0.v, pos0), None, length=n
            )
            return carry[0]

        return lambda: run(weights)

    return maker


n_long, n_short = steps, max(steps // 4, 1)
print(f"model={model} seq={seq_len} pos={fixed_pos} roofline={roofline_ms:.3f} ms/step",
      flush=True)
variants = os.environ.get(
    "MP_VARIANTS", "full,fullfixed,megaonly,megabody"
).split(",")
makers = {
    "full": full_maker(False),
    "fullfixed": full_maker(True),
    "megaonly": mega_maker(True, fixed=False),
    "megafixed": mega_maker(True, fixed=True),
    "megabody": mega_maker(False, fixed=True),
}
for name, maker in ((v, makers[v]) for v in variants):
    per = slope(maker, n_long, n_short)
    print(f"  {name:>9}: {per * 1e3:7.3f} ms/step  frac={roofline_ms / (per * 1e3):.3f}",
          flush=True)
