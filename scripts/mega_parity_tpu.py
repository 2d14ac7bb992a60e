"""Megakernel parity at REAL production dims, on the real TPU.

CI runs the megakernel only in interpret mode at tiny dims (the production
tile plan needs group-rows-per-tile % 8 == 0, which tiny test dims fail),
so the Mosaic lowering, the real tile configuration, and the in-kernel
read-modify-write cache writes at real shapes were previously exercised
only implicitly by bench runs.  This script is the explicit regression
check: one decode step at Qwen3-0.6B body dims (dim 1024 / hidden 3072 /
28 layers / 16q+8kv / head_dim 128 — production tile plan engages), run
through qwen3_forward with the megakernel ON vs OFF, compared at
bf16-accumulation tolerances.  Covers:

  b=1 bf16 cache        (flagship single-stream shape)
  b=8 bf16, mixed positions + write mask   (batched serving shape)
  b=4 int8 cache        (quantized-KV long-context shape)

Exit code != 0 on any mismatch.  Run on the TPU verify queue after any
megakernel / dispatch change; ~2-4 min including compiles.

Usage: python scripts/mega_parity_tpu.py [model]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.models.qwen3 import cast_weight_scales, init_kv_cache, qwen3_forward
from qwen3_rs_tpu.ops.pallas.megakernel import megakernel_supported
from qwen3_rs_tpu.testing import qwen3_config, random_weights

model = sys.argv[1] if len(sys.argv) > 1 else "0.6b"
SEQ = 1024
config = qwen3_config(model, seq_len=SEQ)
weights = cast_weight_scales(random_weights(config))
failures = []


def one_step(disable_mega: bool, batch: int, kv_dtype, pos, write_mask=None):
    # The dispatch reads the env var at TRACE time, so toggling it around
    # separately-jitted closures A/Bs the two code paths in one process.
    os.environ["QWEN3_TPU_DISABLE_MEGAKERNEL"] = "1" if disable_mega else "0"
    try:

        @jax.jit
        def step(w, tok, cache, pos):
            return qwen3_forward(
                config, w, tok, cache, pos, mode="fast", write_mask=write_mask
            )

        cache = init_kv_cache(config, batch=batch, dtype=kv_dtype)
        if kv_dtype == "int8":
            # Non-trivial pre-existing cache content: fill via a short
            # prefix decode on the SAME path so the A/B compares only the
            # step under test... except both paths must see identical
            # cache bits, so fill with the megakernel-off path for both.
            os.environ["QWEN3_TPU_DISABLE_MEGAKERNEL"] = "1"
            fill = jax.jit(
                lambda w, tok, cache, p: qwen3_forward(
                    config, w, tok, cache, p, mode="fast"
                )
            )
            p = jnp.maximum(pos - 3, 0)
            for i in range(3):
                _, cache = fill(weights, tok_fill, cache, p + i)
            os.environ["QWEN3_TPU_DISABLE_MEGAKERNEL"] = "1" if disable_mega else "0"
        tok = jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None] * 17 % config.vocab_size
        logits, cache2 = step(weights, tok, cache, pos)
        return np.asarray(logits, np.float32), jax.tree.map(np.asarray, cache2)
    finally:
        os.environ.pop("QWEN3_TPU_DISABLE_MEGAKERNEL", None)


def check(name, batch, kv_dtype, pos_list, with_mask=False):
    pos = jnp.asarray(pos_list, jnp.int32)
    dt = jnp.int8 if kv_dtype == "int8" else kv_dtype
    if not megakernel_supported(config, SEQ, dt, batch):
        print(f"{name}: SKIP (megakernel_supported=False at these dims)")
        failures.append(name + " (unsupported — expected supported at real dims)")
        return
    mask = None
    if with_mask:
        mask = jnp.asarray([i % 2 == 0 for i in range(batch)])
    lm, cm = one_step(False, batch, kv_dtype, pos, write_mask=mask)
    lx, cx = one_step(True, batch, kv_dtype, pos, write_mask=mask)
    # Drift envelope: the megakernel uses bf16 scale_w/dot numerics with an
    # f32 residual stream; the XLA fallback keeps f32 activations and
    # post-dot scales.  Over 28 layers of RANDOM (untrained) weights —
    # activations grow layer over layer and logits are near-flat — the
    # expected divergence is a few percent of the logit range, and flat
    # logits make exact-argmax a coin flip on near-ties.  So: bounded
    # relative error, and argmax mismatches only count when the two
    # candidates are separated by a real margin in BOTH paths.
    err = np.max(np.abs(lm - lx)) / (np.max(np.abs(lx)) + 1e-9)
    spread = np.maximum(lx.max(-1) - lx.min(-1), 1e-9)  # [B]
    am, ax = np.argmax(lm, -1), np.argmax(lx, -1)
    real_flips = 0
    for b in range(batch):
        if am[b] == ax[b]:
            continue
        margin_x = (lx[b, ax[b]] - lx[b, am[b]]) / spread[b]
        margin_m = (lm[b, am[b]] - lm[b, ax[b]]) / spread[b]
        if margin_x > 0.05 and margin_m > 0.05:
            real_flips += 1
    # Cache rows written this step: compare at each row's position,
    # relative to that row's magnitude.
    cache_rel = 0.0
    quant = kv_dtype == "int8"

    def row(cache_tuple, which, b, p):
        arr = cache_tuple[which][:, b, :, p, :].astype(np.float32)
        if quant:  # dequantize codes with the per-(layer, head, row) scale
            arr = arr * cache_tuple[2 + which][:, b, :, p][:, :, None]
        return arr

    for b in range(batch):
        if mask is not None and not bool(mask[b]):
            continue
        p = int(pos_list[b])
        for which in (0, 1):
            rm = row(cm, which, b, p)
            rx = row(cx, which, b, p)
            denom = max(1.0, float(np.abs(rx).max()))
            cache_rel = max(cache_rel, float(np.abs(rm - rx).max()) / denom)
    ok = err < 0.08 and real_flips == 0 and cache_rel < 0.08
    print(
        f"{name}: rel_logit_err={err:.5f} real_argmax_flips={real_flips} "
        f"cache_rel_err={cache_rel:.5f} -> {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    if not ok:
        failures.append(name)


def check_greedy(name, batch, pos_list):
    """Fused greedy epilogue vs the same kernel's own logits argmax —
    SAME numerics path, so the match must be exact (no drift envelope)."""
    pos = jnp.asarray(pos_list, jnp.int32)
    cache = init_kv_cache(config, batch=batch, dtype=jnp.bfloat16)
    tok = jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None] * 17 % config.vocab_size

    @jax.jit
    def step_logits(w, tok, cache, pos):
        return qwen3_forward(config, w, tok, cache, pos, mode="fast")

    @jax.jit
    def step_greedy(w, tok, cache, pos):
        return qwen3_forward(
            config, w, tok, cache, pos, mode="fast", greedy_head=True
        )

    logits, _ = step_logits(weights, tok, cache, pos)
    toks, _ = step_greedy(weights, tok, cache, pos)
    want = np.argmax(np.asarray(logits, np.float32)[:, : config.vocab_size], -1)
    got = np.asarray(toks)
    ok = bool((got == want).all())
    print(f"{name}: greedy_tokens={got.tolist()} argmax={want.tolist()} -> "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append(name)


tok_fill = jnp.ones((4, 1), jnp.int32)

check("b1_bf16", 1, jnp.bfloat16, [512])
check("b8_bf16_mixed_pos_mask", 8, jnp.bfloat16, [7, 64, 128, 200, 311, 400, 512, 700],
      with_mask=True)
check("b4_int8", 4, "int8", [256, 256, 384, 512])
check_greedy("b1_greedy_fused", 1, [512])
check_greedy("b4_greedy_fused", 4, [7, 200, 511, 768])

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print("ALL OK")
