"""Flash decode attention kernel: interpret-mode parity vs split attention."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_rs_tpu.ops.attention import gqa_attention_split
from qwen3_rs_tpu.ops.pallas.flash_attention import (
    BLK_T,
    decode_supported,
    flash_gqa_decode_stacked,
)


@pytest.mark.parametrize("pos_vals", [[700, 0], [BLK_T, 2 * BLK_T - 1], [1, 5]])
def test_matches_split_attention(rng, pos_vals):
    L, B, n_kv, hd = 2, 2, 2, 128
    T = 2 * BLK_T
    kv_mul = 2
    n_heads = n_kv * kv_mul
    k_all = rng.normal(0, 1, (L, B, n_kv, T, hd)).astype(np.float32)
    v_all = rng.normal(0, 1, (L, B, n_kv, T, hd)).astype(np.float32)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array(pos_vals, np.int32)
    layer = 1

    out = np.asarray(
        flash_gqa_decode_stacked(
            jnp.asarray(q),
            jnp.asarray(kn),
            jnp.asarray(vn),
            jnp.asarray(k_all),
            jnp.asarray(v_all),
            jnp.asarray(pos),
            layer,
            interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split(
            jnp.asarray(q)[:, None],
            jnp.asarray(k_all[layer]),
            jnp.asarray(v_all[layer]),
            jnp.asarray(kn)[:, None],
            jnp.asarray(vn)[:, None],
            jnp.asarray(pos)[:, None],
            jnp.asarray(pos),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_matches_split_attention_int8_cache(rng):
    """INT8-cache variant: per-row scales fold into scores/probs in-kernel;
    parity vs the XLA split path reading the same codes + scales."""
    L, B, n_kv, hd = 2, 2, 2, 128
    T = 2 * BLK_T
    n_heads = 4
    codes_k = rng.integers(-127, 128, (L, B, n_kv, T, hd)).astype(np.int8)
    codes_v = rng.integers(-127, 128, (L, B, n_kv, T, hd)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (L, B, n_kv, T)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (L, B, n_kv, T)).astype(np.float32)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array([700, 3], np.int32)
    layer = 0

    out = np.asarray(
        flash_gqa_decode_stacked(
            jnp.asarray(q),
            jnp.asarray(kn),
            jnp.asarray(vn),
            jnp.asarray(codes_k),
            jnp.asarray(codes_v),
            jnp.asarray(pos),
            layer,
            k_scale_all=jnp.asarray(ks),
            v_scale_all=jnp.asarray(vs),
            interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split(
            jnp.asarray(q)[:, None],
            jnp.asarray(codes_k[layer]),
            jnp.asarray(codes_v[layer]),
            jnp.asarray(kn)[:, None],
            jnp.asarray(vn)[:, None],
            jnp.asarray(pos)[:, None],
            jnp.asarray(pos),
            k_scale_cache=jnp.asarray(ks[layer]),
            v_scale_cache=jnp.asarray(vs[layer]),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_uneven_kv_mul_and_t_blocks(rng):
    """T that only divides by the smallest candidate block + kv_mul=4."""
    L, B, n_kv, hd = 1, 1, 2, 128
    T = 384  # only 128 divides
    n_heads = 8
    k_all = rng.normal(0, 1, (L, B, n_kv, T, hd)).astype(np.float32)
    v_all = rng.normal(0, 1, (L, B, n_kv, T, hd)).astype(np.float32)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array([383], np.int32)

    out = np.asarray(
        flash_gqa_decode_stacked(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(k_all), jnp.asarray(v_all), jnp.asarray(pos), 0,
            interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split(
            jnp.asarray(q)[:, None], jnp.asarray(k_all[0]), jnp.asarray(v_all[0]),
            jnp.asarray(kn)[:, None], jnp.asarray(vn)[:, None],
            jnp.asarray(pos)[:, None], jnp.asarray(pos),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_decode_supported_gates():
    assert decode_supported(16, 8, 128, 16384)
    assert decode_supported(16, 8, 128, 512)  # v2 engages from 512 windows
    assert not decode_supported(16, 8, 128, 256)  # below MIN_SEQ_LEN
    assert not decode_supported(16, 8, 64, 16384)  # head_dim not 128-lane
    assert not decode_supported(16, 8, 128, 1088)  # no supported DMA block
