"""Synthetic model builders for benchmarks, smoke tests and dry runs."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .configuration import ARCHITECTURE_QWEN3, ModelConfig
from .models.qwen3 import Qwen3LayerWeights, Qwen3Weights
from .ops.quant import QuantizedTensor

# Real Qwen3 family shapes (HF configs).
QWEN3_CONFIGS = {
    "0.6b": dict(dim=1024, hidden_dim=3072, n_layers=28, n_heads=16, n_kv_heads=8,
                 head_dim=128, vocab_size=151936),
    "1.7b": dict(dim=2048, hidden_dim=6144, n_layers=28, n_heads=16, n_kv_heads=8,
                 head_dim=128, vocab_size=151936),
    "4b": dict(dim=2560, hidden_dim=9728, n_layers=36, n_heads=32, n_kv_heads=8,
               head_dim=128, vocab_size=151936),
    "8b": dict(dim=4096, hidden_dim=12288, n_layers=36, n_heads=32, n_kv_heads=8,
               head_dim=128, vocab_size=151936),
}


def qwen3_config(name: str = "0.6b", seq_len: int = 4096, group_size: int = 64,
                 n_layers: int | None = None) -> ModelConfig:
    base = dict(QWEN3_CONFIGS[name])
    if n_layers is not None:
        base["n_layers"] = n_layers
    return ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        seq_len=seq_len,
        group_size=group_size,
        shared_classifier=True,
        **base,
    ).validate()


def random_weights(config: ModelConfig, seed: int = 0) -> Qwen3Weights:
    """Random INT8-quantized weights with plausible scales — exercises the
    real memory traffic and kernels without needing checkpoint files.

    Linear weights use the in-major compute layout ([in, out] codes with
    [in/g, out] scales, see ops/matmul.py); lm_head's vocab axis is padded
    to the same tile multiple the checkpoint loader uses.
    """
    from .checkpoint import VOCAB_PAD_MULTIPLE

    rng = np.random.default_rng(seed)
    c = config
    g = c.group_size

    def qt_T(in_dim, out_dim):
        q = rng.integers(-127, 128, (in_dim, out_dim), dtype=np.int8)
        s = (rng.random((in_dim // g, out_dim), dtype=np.float32) * 0.02).astype(np.float32)
        return QuantizedTensor(jnp.asarray(q), jnp.asarray(s))

    def stack(f, *shape_args):
        qs, ss = [], []
        for _ in range(c.n_layers):
            t = f(*shape_args)
            qs.append(t.q)
            ss.append(t.scales)
        return QuantizedTensor(jnp.stack(qs), jnp.stack(ss))

    def norm(*shape):
        return jnp.asarray(rng.normal(1, 0.02, shape).astype(np.float32))

    embed_q = rng.integers(-127, 128, (c.vocab_size, c.dim), dtype=np.int8)
    embed_s = (rng.random((c.vocab_size, c.dim // g), dtype=np.float32) * 0.02).astype(np.float32)
    embed = QuantizedTensor(jnp.asarray(embed_q), jnp.asarray(embed_s))

    v_pad = c.vocab_size
    if v_pad >= VOCAB_PAD_MULTIPLE and v_pad % VOCAB_PAD_MULTIPLE:
        v_pad += VOCAB_PAD_MULTIPLE - v_pad % VOCAB_PAD_MULTIPLE
    lm_q = np.zeros((c.dim, v_pad), np.int8)
    lm_s = np.ones((c.dim // g, v_pad), np.float32)
    lm_q[:, : c.vocab_size] = embed_q.T
    lm_s[:, : c.vocab_size] = embed_s.T
    lm_head = QuantizedTensor(jnp.asarray(lm_q), jnp.asarray(lm_s))

    layers = Qwen3LayerWeights(
        rms_att=norm(c.n_layers, c.dim),
        rms_ffn=norm(c.n_layers, c.dim),
        q_norm=norm(c.n_layers, c.head_dim),
        k_norm=norm(c.n_layers, c.head_dim),
        wqkv=stack(qt_T, c.dim, c.all_heads_dim + 2 * c.kv_dim),
        wo=stack(qt_T, c.all_heads_dim, c.dim),
        w13=stack(qt_T, c.dim, 2 * c.hidden_dim),
        w2=stack(qt_T, c.hidden_dim, c.dim),
    )
    return Qwen3Weights(embed=embed, layers=layers, rms_final=norm(c.dim), lm_head=lm_head)


def weight_bytes_per_decode_token(config: ModelConfig) -> int:
    """HBM bytes of weights+scales streamed per decode step (roofline input).

    Embedding gather reads one row; the classifier reads all of lm_head.
    """
    c = config
    scale_overhead = 1.0 + 4.0 / c.group_size
    per_layer = (
        c.dim * c.all_heads_dim  # wq
        + 2 * c.dim * c.kv_dim  # wk, wv
        + c.all_heads_dim * c.dim  # wo
        + 3 * c.dim * c.hidden_dim  # w1, w2, w3
    )
    total = c.n_layers * per_layer + c.vocab_size * c.dim  # + lm_head
    return int(total * scale_overhead)
