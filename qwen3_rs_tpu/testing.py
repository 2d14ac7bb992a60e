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
    real memory traffic and kernels without needing checkpoint files."""
    rng = np.random.default_rng(seed)
    c = config
    g = c.group_size

    def qt(*shape):
        q = rng.integers(-127, 128, shape, dtype=np.int8)
        s = (rng.random((*shape[:-1], shape[-1] // g), dtype=np.float32) * 0.02).astype(
            np.float32
        )
        return QuantizedTensor(jnp.asarray(q), jnp.asarray(s))

    def norm(*shape):
        return jnp.asarray(rng.normal(1, 0.02, shape).astype(np.float32))

    embed = qt(c.vocab_size, c.dim)
    layers = Qwen3LayerWeights(
        rms_att=norm(c.n_layers, c.dim),
        rms_ffn=norm(c.n_layers, c.dim),
        q_norm=norm(c.n_layers, c.head_dim),
        k_norm=norm(c.n_layers, c.head_dim),
        wq=qt(c.n_layers, c.all_heads_dim, c.dim),
        wk=qt(c.n_layers, c.kv_dim, c.dim),
        wv=qt(c.n_layers, c.kv_dim, c.dim),
        wo=qt(c.n_layers, c.dim, c.all_heads_dim),
        w1=qt(c.n_layers, c.hidden_dim, c.dim),
        w2=qt(c.n_layers, c.dim, c.hidden_dim),
        w3=qt(c.n_layers, c.hidden_dim, c.dim),
    )
    return Qwen3Weights(embed=embed, layers=layers, rms_final=norm(c.dim), lm_head=embed)


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
