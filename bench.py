"""Benchmark harness — prints ONE JSON line for the driver.

Measures single-stream decode throughput of the flagship Qwen3-0.6B-shaped
INT8-g64 model (random weights, fast/Pallas path) on the attached device.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
comparison is against the hardware roofline: decode is HBM-bandwidth-bound,
so speed-of-light tokens/sec = HBM_BW / bytes-streamed-per-token.
``vs_baseline`` is the fraction of that roofline achieved (1.0 = at roofline).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# v5e (v5 lite) HBM bandwidth ≈ 819 GB/s.
HBM_BW_BY_KIND = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 1228e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "cpu": 50e9,
}


def main() -> None:
    from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
    from qwen3_rs_tpu.testing import (
        qwen3_config,
        random_weights,
        weight_bytes_per_decode_token,
    )

    model_name = os.environ.get("BENCH_MODEL", "0.6b")
    seq_len = int(os.environ.get("BENCH_SEQ_LEN", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    decode_steps = int(os.environ.get("BENCH_STEPS", "64"))

    config = qwen3_config(model_name, seq_len=seq_len)
    weights = random_weights(config)
    cache = init_kv_cache(config, batch=batch, dtype=jnp.bfloat16)

    import functools

    step = jax.jit(
        functools.partial(qwen3_forward, config, mode="fast"), donate_argnums=(2,)
    )

    tokens = jnp.ones((batch, 1), jnp.int32)
    pos = jnp.zeros(batch, jnp.int32)

    # Warmup / compile.
    logits, cache = step(weights, tokens, cache, pos)
    logits.block_until_ready()

    start = time.perf_counter()
    for i in range(decode_steps):
        pos = pos + 1
        logits, cache = step(weights, tokens, cache, pos)
    logits.block_until_ready()
    elapsed = time.perf_counter() - start

    tok_per_sec = batch * decode_steps / elapsed

    device_kind = jax.devices()[0].device_kind
    bw = HBM_BW_BY_KIND.get(device_kind, 819e9)
    roofline = bw / weight_bytes_per_decode_token(config)

    print(
        json.dumps(
            {
                "metric": f"decode_tok_s_qwen3_{model_name}_int8g64_b{batch}",
                "value": round(tok_per_sec, 2),
                "unit": "tokens/sec",
                "vs_baseline": round(tok_per_sec / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
