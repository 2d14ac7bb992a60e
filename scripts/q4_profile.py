"""INT4 decode step decomposition: where do the missing roofline points go?

The INT4 (per-matrix) decode measures ~0.61 of its halved-stream roofline
while the INT8 megakernel body reaches 0.92 (EVIDENCE §4/§5).  Round 4
proved the unpack op count is the v5e floor (no bf16 ALU) and that two
pass-count reductions are neutral — but never produced a per-component
accounting.  This script does, same-process:

  per matrix shape (wqkv/wo/w13/w2 at the model dims, b=1):
    q4     — the real Q4 stacked-fused kernel (what the decode path runs)
    i8half — an INT8 kernel over [L, n/2, d]: SAME code-byte stream, no
             nibble unpack → the DMA+dequant+dot floor at equal bytes
    i8full — the INT8 kernel at full bytes (the 2× stream baseline)
  then:
    sum    — Σ shapes × n_layers + head(int8)    vs
    full   — the measured full INT4 decode step (per-matrix path)
  The (full − sum) residual is attention + XLA glue + per-kernel boundary
  cost (~5-7 µs/call, scripts/boundary_probe.py), and (q4 − i8half) per
  shape is the pure unpack overhead at matched traffic.

Usage: python scripts/q4_profile.py [model] [steps]
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
from qwen3_rs_tpu.ops.pallas import qmatmul_pallas_stacked_fused
from qwen3_rs_tpu.ops.quant import Q4Tensor, QuantizedTensor
from qwen3_rs_tpu.testing import (
    qwen3_config,
    random_weights,
    weight_bytes_per_decode_token,
)

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 48
SEQ = 1024

config = qwen3_config(model, seq_len=SEQ)
HBM_BW = 819e9
# Microbench weight stacks use a short layer axis: per-call work and the
# HBM stream are identical (the chain strides layers mod L), but the
# resident footprint drops 9× — the full-L i8full stacks OOM'd the chip
# next to the leftover variant buffers.
L = int(os.environ.get("Q4P_LAYERS", "4"))
L_REAL = config.n_layers
g = config.group_size

shapes = {
    "wqkv": (config.dim, config.all_heads_dim + 2 * config.kv_dim),
    "wo": (config.all_heads_dim, config.dim),
    "w13": (config.dim, 2 * config.hidden_dim),
    "w2": (config.hidden_dim, config.dim),
}

key = jax.random.PRNGKey(0)


def mk_q4(n, d):
    packed = jax.random.bits(key, (L, n // 2, d), jnp.uint8)
    s = jax.random.uniform(key, (L, n // g, d), jnp.float32, 0.0, 0.02)
    return Q4Tensor(packed, s.astype(jnp.bfloat16))


def mk_i8(n, d):
    q = jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8)
    q = jnp.where(q == jnp.int8(-128), jnp.int8(0), q)
    s = jax.random.uniform(key, (L, n // g, d), jnp.float32, 0.0, 0.02)
    return QuantizedTensor(q, s.astype(jnp.bfloat16))


def slope(maker, n_long, n_short):
    out = {}
    for n in (n_long, n_short):
        f = maker(n)
        np.asarray(f())  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[n] = best
    return (out[n_long] - out[n_short]) / (n_long - n_short)


def chain_maker(w, n_in):
    """Chained per-layer kernel calls, layer-striding like a decode step:
    one call per layer per iteration, x fed back to defeat CSE/DCE."""

    def maker(n_steps):
        @jax.jit
        def run(w):
            x0 = jnp.ones((1, n_in), jnp.float32)

            def body(carry, l):
                x, acc = carry
                out = qmatmul_pallas_stacked_fused(x, w, l % L)
                acc = acc + jnp.sum(out) * 1e-30
                x = x0 * (1.0 + acc * 1e-30)
                return (x, acc), ()

            carry, _ = jax.lax.scan(
                body, (x0, jnp.float32(0.0)), jnp.arange(n_steps * L)
            )
            return carry[1]

        return lambda: run(w)

    return maker


n_long, n_short = steps, max(steps // 4, 1)
print(f"model={model} L={L} (per-matrix Q4 decode decomposition)", flush=True)

per_shape = {}
for name, (n, d) in shapes.items():
    row = {}
    for variant in ("q4", "i8half", "i8full"):
        # Free the previous variant's weight stack + compiled fns before
        # allocating the next (w13 i8full alone is 3.6 GB at 8B; keeping
        # three variants × four shapes live OOM'd a 16 GB chip).
        import gc
        w = None  # noqa: F841 — drop the previous stack's last reference
        gc.collect()
        jax.clear_caches()
        if variant == "q4":
            w = mk_q4(n, d)
            code_bytes = n * d // 2
            scale_bytes = (n // g) * d * 2
        elif variant == "i8half":
            w = mk_i8(n // 2, d)
            code_bytes = n * d // 2
            scale_bytes = (n // 2 // g) * d * 2
        else:
            w = mk_i8(n, d)
            code_bytes = n * d
            scale_bytes = (n // g) * d * 2
        per_call = slope(chain_maker(w, w.shape[-2]), n_long, n_short) / L
        roof_us = (code_bytes + scale_bytes) / HBM_BW * 1e6
        row[variant] = (per_call * 1e6, roof_us)
        print(
            f"  {name:>5} {variant:>7}: {per_call * 1e6:8.2f} µs/call "
            f"(roofline {roof_us:7.2f}, frac {roof_us / (per_call * 1e6):.3f})",
            flush=True,
        )
    per_shape[name] = row
    unpack_us = row["q4"][0] - row["i8half"][0]
    print(
        f"  {name:>5} unpack overhead vs i8half: {unpack_us:+.2f} µs/call "
        f"({unpack_us * L_REAL:+.1f} µs/step over {L_REAL} layers)",
        flush=True,
    )

# Full INT4 decode step (the bench path) for the residual accounting.
weights = cast_weight_scales(random_weights(config, bits=4))
roof_step_ms = weight_bytes_per_decode_token(config, scale_bytes=2, bits=4) / HBM_BW * 1e3


def full_maker(n_steps):
    @jax.jit
    def run(w):
        cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
        tok = jnp.ones((1, 1), jnp.int32)
        pos0 = jnp.zeros((1,), jnp.int32)

        def body(carry, _):
            token, cache, pos = carry
            logits, cache = qwen3_forward(config, w, token, cache, pos, mode="fast")
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache, pos + 1), ()

        carry, _ = jax.lax.scan(body, (tok, cache, pos0), None, length=n_steps)
        return carry[0]

    return lambda: run(weights)


full_ms = slope(full_maker, n_long, n_short) * 1e3
body_us = sum(per_shape[nm]["q4"][0] for nm in shapes) * L_REAL
# Head: INT8 rows at [dim, v_pad] — reuse its measured share from the
# megakernel profile era (~0.68 of its byte share) unless measured here.
head_bytes = weights.lm_head.q.shape[-2] * weights.lm_head.q.shape[-1]
head_bytes += weights.lm_head.scales.shape[-2] * weights.lm_head.scales.shape[-1] * 2
head_roof_us = head_bytes / HBM_BW * 1e6

print(f"\n  full INT4 step : {full_ms:8.3f} ms (roofline {roof_step_ms:.3f}, "
      f"frac {roof_step_ms / full_ms:.3f})", flush=True)
print(f"  Σ matmul calls : {body_us / 1e3:8.3f} ms ({L_REAL} layers × 4 kernels)",
      flush=True)
print(f"  head byte share: {head_roof_us / 1e3:8.3f} ms at roofline "
      f"(measured separately ≈ share/0.68)", flush=True)
print(f"  residual (full − Σ − head/0.68): "
      f"{full_ms - body_us / 1e3 - head_roof_us / 0.68 / 1e3:8.3f} ms "
      f"= attention + glue + boundaries", flush=True)
