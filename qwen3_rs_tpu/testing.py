"""Synthetic model builders for benchmarks, smoke tests and dry runs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .configuration import ARCHITECTURE_QWEN3, ModelConfig
from .models.qwen3 import Qwen3LayerWeights, Qwen3Weights
from .ops.quant import Q4Tensor, QuantizedTensor

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


def random_weights(config: ModelConfig, seed: int = 0, bits: int = 8) -> Qwen3Weights:
    """Random INT8-quantized weights with plausible scales — exercises the
    real memory traffic and kernels without needing checkpoint files.

    Linear weights use the in-major compute layout ([in, out] codes with
    [in/g, out] scales, see ops/matmul.py); lm_head's vocab axis is padded
    to the same tile multiple the checkpoint loader uses.

    Arrays are generated **on device**, inside a single jitted program:
    pushing ~8 GB of host randomness over a slow host→device link — or
    dispatching ~100 eager primitives, each paying a remote-compile round
    trip in this deployment — dominated setup time for the 8B flagship
    config.  int8 codes come from raw random bits (1x memory, no wide
    intermediates); a value of -128 is folded to 0 to match the Q8_0
    [-127, 127] code range.
    """
    from .checkpoint import VOCAB_PAD_MULTIPLE

    c = config
    g = c.group_size
    v_pad = c.vocab_size
    if v_pad >= VOCAB_PAD_MULTIPLE and v_pad % VOCAB_PAD_MULTIPLE:
        v_pad += VOCAB_PAD_MULTIPLE - v_pad % VOCAB_PAD_MULTIPLE

    def build(key):
        keys = iter(jax.random.split(key, 16))

        def int8_codes(shape):
            bits = jax.random.bits(next(keys), shape, jnp.uint8).astype(jnp.int8)
            return jnp.where(bits == jnp.int8(-128), jnp.int8(0), bits)

        def stack(in_dim, out_dim):
            s = jax.random.uniform(
                next(keys), (c.n_layers, in_dim // g, out_dim), jnp.float32, 0.0, 0.02
            )
            if bits == 4:
                # Nibble-packed codes: random bytes ARE two packed codes.
                packed = jax.random.bits(
                    next(keys), (c.n_layers, in_dim // 2, out_dim), jnp.uint8
                )
                return Q4Tensor(packed, s)
            q = int8_codes((c.n_layers, in_dim, out_dim))
            return QuantizedTensor(q, s)

        def norm(*shape):
            return 1.0 + 0.02 * jax.random.normal(next(keys), shape, jnp.float32)

        embed_q = int8_codes((c.vocab_size, c.dim))
        embed_s = jax.random.uniform(
            next(keys), (c.vocab_size, c.dim // g), jnp.float32, 0.0, 0.02
        )
        embed = QuantizedTensor(embed_q, embed_s)

        pad = v_pad - c.vocab_size
        lm_q = jnp.pad(embed_q.T, [(0, 0), (0, pad)])
        lm_s = jnp.pad(embed_s.T, [(0, 0), (0, pad)], constant_values=1.0)
        lm_head = QuantizedTensor(lm_q, lm_s)

        layers = Qwen3LayerWeights(
            rms_att=norm(c.n_layers, c.dim),
            rms_ffn=norm(c.n_layers, c.dim),
            q_norm=norm(c.n_layers, c.head_dim),
            k_norm=norm(c.n_layers, c.head_dim),
            wqkv=stack(c.dim, c.all_heads_dim + 2 * c.kv_dim),
            wo=stack(c.all_heads_dim, c.dim),
            w13=stack(c.dim, 2 * c.hidden_dim),
            w2=stack(c.hidden_dim, c.dim),
        )
        return Qwen3Weights(
            embed=embed, layers=layers, rms_final=norm(c.dim), lm_head=lm_head
        )

    return jax.jit(build)(jax.random.PRNGKey(seed))


def weight_bytes_per_decode_token(
    config: ModelConfig, scale_bytes: int = 4, bits: int = 8
) -> int:
    """HBM bytes of weights+scales streamed per decode step (roofline input).

    Embedding gather reads one row; the classifier reads all of lm_head.
    ``scale_bytes``: per-group scale width actually streamed (4 = f32
    checkpoint scales, 2 = the fast engine's bf16 cast).  ``bits``: linear
    layer code width (4 = nibble-packed INT4; lm_head stays INT8).
    """
    c = config
    code_bytes = bits / 8.0
    scale_per_param = scale_bytes / c.group_size
    per_layer = (
        c.dim * c.all_heads_dim  # wq
        + 2 * c.dim * c.kv_dim  # wk, wv
        + c.all_heads_dim * c.dim  # wo
        + 3 * c.dim * c.hidden_dim  # w1, w2, w3
    )
    linear = c.n_layers * per_layer
    head = c.vocab_size * c.dim  # lm_head (always int8)
    total = linear * (code_bytes + scale_per_param) + head * (1.0 + scale_per_param)
    return int(total)


def prefill_flops(config: ModelConfig, s: int, batch: int = 1) -> float:
    """MAC-derived FLOPs of one prefill forward (compute roofline input).

    Linear layers: 2 FLOPs per weight param per token.  Attention: the QKᵀ
    and PV causal contractions do ~S²/2 useful positions each per (layer,
    head), 2·head_dim MACs per position.  The classifier head runs on one
    row per request (logits are only fetched for the last real row).
    """
    c = config
    per_layer = (
        c.dim * (c.all_heads_dim + 2 * c.kv_dim)  # wqkv
        + c.all_heads_dim * c.dim  # wo
        + 3 * c.dim * c.hidden_dim  # w13, w2
    )
    linear = 2.0 * c.n_layers * per_layer * s
    attn = 2.0 * c.n_layers * c.n_heads * 2 * (s * s / 2.0) * c.head_dim
    head = 2.0 * c.dim * c.vocab_size  # one row per request
    return batch * (linear + attn + head)
