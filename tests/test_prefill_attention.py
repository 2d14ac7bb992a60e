"""Splash prefill attention: interpret-mode parity vs the XLA split path."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_rs_tpu.ops.attention import gqa_attention_split
from qwen3_rs_tpu.ops.pallas.prefill_attention import (
    causal_prefill_attention,
    splash_prefill_supported,
)


@pytest.mark.parametrize("s", [512, 1024])
def test_matches_split_attention_fresh(rng, s):
    B, n_kv, kv_mul, hd = 2, 2, 2, 128
    n_heads = n_kv * kv_mul
    T = 2048
    q = rng.normal(0, 1, (B, s, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, s, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, s, n_kv, hd)).astype(np.float32)
    # Cache contents must be irrelevant at pos_start = 0.
    k_cache = rng.normal(0, 1, (B, n_kv, T, hd)).astype(np.float32)
    v_cache = rng.normal(0, 1, (B, n_kv, T, hd)).astype(np.float32)
    pos0 = np.zeros(B, np.int32)
    q_pos = np.broadcast_to(np.arange(s, dtype=np.int32), (B, s))

    out = np.asarray(
        causal_prefill_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn), interpret=True
        )
    )
    ref = np.asarray(
        gqa_attention_split(
            jnp.asarray(q),
            jnp.asarray(k_cache),
            jnp.asarray(v_cache),
            jnp.asarray(kn),
            jnp.asarray(vn),
            jnp.asarray(q_pos),
            jnp.asarray(pos0),
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_supported_gates():
    assert splash_prefill_supported(1024, 128, 32, 8)
    assert not splash_prefill_supported(100, 128, 32, 8)  # not block-divisible
    assert not splash_prefill_supported(1024, 64, 32, 8)  # head_dim lanes
    assert not splash_prefill_supported(1024, 128, 30, 8)  # ragged GQA
