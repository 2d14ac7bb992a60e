"""Architecture registry: per-architecture tensor-name schedules.

Capability parity with qwen3-export/src/models/{mod,qwen3}.rs — declares,
per architecture, the HF tensor names for norm weights and quantized weight
components, plus shared-classifier detection.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..configuration import ARCHITECTURE_LLAMA, ARCHITECTURE_QWEN3, ModelConfig
from .tensor_reader import TensorReader


@dataclasses.dataclass(frozen=True)
class NormWeightLayer:
    """One norm-weight entry (models/mod.rs:47-61): ``name`` may contain a
    ``{}`` layer placeholder; optional entries default to 1.0."""

    name: str
    layered: bool
    is_required: bool
    # Length of the default-1.0 vector when missing (head_dim for q/k norms,
    # model_exporter.rs:209-213).
    default_len_attr: str = "head_dim"


@dataclasses.dataclass(frozen=True)
class WeightComponent:
    """One quantized weight component: HF name + native checkpoint name."""

    hf_component: str  # e.g. "self_attn.q_proj" (no .weight suffix)
    native_name: str  # e.g. "wq"


class Qwen3Architecture:
    """Qwen3 tensor schedule (qwen3-export/src/models/qwen3.rs:5-91)."""

    ID = ARCHITECTURE_QWEN3
    NAME = "Qwen3ForCausalLM"
    EMBED_TOKENS_KEY = "model.embed_tokens.weight"
    LM_HEAD_KEY = "lm_head.weight"

    # Order matters: it is the legacy checkpoint's norm-section order
    # (models/qwen3.rs:16-22 = inference models/qwen3.rs:228-232).
    NORM_WEIGHT_LAYERS = (
        NormWeightLayer("model.layers.{}.input_layernorm.weight", True, True),
        NormWeightLayer("model.layers.{}.post_attention_layernorm.weight", True, True),
        NormWeightLayer("model.norm.weight", False, True),
        NormWeightLayer("model.layers.{}.self_attn.q_norm.weight", True, False),
        NormWeightLayer("model.layers.{}.self_attn.k_norm.weight", True, False),
    )
    NORM_NATIVE_NAMES = ("rms_att", "rms_ffn", "rms_final", "q_norm", "k_norm")

    # Order matters: legacy component order, layer-major inner loop
    # (models/qwen3.rs:25-44; read side inference models/qwen3.rs:244-250).
    WEIGHT_COMPONENTS = (
        WeightComponent("self_attn.q_proj", "wq"),
        WeightComponent("self_attn.k_proj", "wk"),
        WeightComponent("self_attn.v_proj", "wv"),
        WeightComponent("self_attn.o_proj", "wo"),
        WeightComponent("mlp.gate_proj", "w1"),
        WeightComponent("mlp.down_proj", "w2"),
        WeightComponent("mlp.up_proj", "w3"),
    )

    def __init__(self, config: ModelConfig, tensor_reader: TensorReader):
        self.config = config
        self.tensor_reader = tensor_reader

    def layer_tensor_name(self, component: str, layer_idx: int) -> str:
        return f"model.layers.{layer_idx}.{component}.weight"

    def detect_shared_classifier(self) -> bool:
        """Elementwise-compare lm_head vs embeddings within 1e-6; absent
        lm_head ⇒ shared (qwen3-export/src/models/qwen3.rs:59-74)."""
        lm_head = self.tensor_reader.load_tensor(self.LM_HEAD_KEY)
        embed = self.tensor_reader.load_tensor(self.EMBED_TOKENS_KEY)
        if lm_head is None and embed is not None:
            return True
        if lm_head is None or embed is None:
            return False
        return lm_head.size == embed.size and bool(
            np.all(np.abs(lm_head.reshape(-1) - embed.reshape(-1)) < 1e-6)
        )


class LlamaArchitecture(Qwen3Architecture):
    """Llama tensor schedule — same projection/norm names as Qwen3 in HF
    checkpoints, but no q_norm/k_norm tensors (the optional entries default
    to 1.0 vectors in the artifact; inference skips QK-norm entirely via
    ``config.use_qk_norm``).

    The reference declares this architecture but leaves it unimplemented
    (`todo!`, qwen3-export/src/models/mod.rs:94); it is implemented here.
    """

    ID = ARCHITECTURE_LLAMA
    NAME = "LlamaForCausalLM"


ARCHITECTURES = {
    ARCHITECTURE_QWEN3: Qwen3Architecture,
    ARCHITECTURE_LLAMA: LlamaArchitecture,
}


def create_architecture(config: ModelConfig, tensor_reader: TensorReader):
    """Architecture dispatch (models/mod.rs:91-96)."""
    cls = ARCHITECTURES.get(config.architecture_id)
    if cls is None:
        raise NotImplementedError(
            f"Architecture id {config.architecture_id} not yet implemented"
        )
    return cls(config, tensor_reader)
