"""Model registry: architecture id → forward implementation.

Counterpart of the reference model dispatch
(qwen3-inference/src/models/mod.rs:20-37,69-72).
"""

from __future__ import annotations

from ..configuration import ARCHITECTURE_LLAMA, ARCHITECTURE_QWEN3, ModelConfig
from .qwen3 import (
    KVCache,
    Qwen3LayerWeights,
    Qwen3Weights,
    init_kv_cache,
    qwen3_forward,
)

MODEL_FORWARDS = {
    ARCHITECTURE_QWEN3: qwen3_forward,
    # Llama shares the decoder structure; QK-norm is disabled via
    # config.use_qk_norm (the reference leaves Llama as `todo!`).
    ARCHITECTURE_LLAMA: qwen3_forward,
}


def get_forward(config: ModelConfig):
    fwd = MODEL_FORWARDS.get(config.architecture_id)
    if fwd is None:
        raise ValueError(f"Unknown architecture_id: {config.architecture_id}")
    return fwd


__all__ = [
    "KVCache",
    "Qwen3LayerWeights",
    "Qwen3Weights",
    "init_kv_cache",
    "qwen3_forward",
    "get_forward",
    "MODEL_FORWARDS",
]
