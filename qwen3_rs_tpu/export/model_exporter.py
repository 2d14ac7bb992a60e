"""Quantized model export: HF safetensors → INT8-g64 checkpoint.

Capability parity with qwen3-export/src/model_exporter.rs:

* Q8_0 symmetric per-group quantization with **round-half-to-even** and
  clamp ±127, scale ``max/127`` (1.0 for all-zero groups)
  (model_exporter.rs:104-161, :320-338) — ``np.round`` is half-to-even, so
  the rounding matches by construction;
* group-size auto-fix: halve until it divides ``dim``, floor 4
  (model_exporter.rs:48-57);
* streaming export: one tensor at a time (load → optional LoRA merge →
  quantize → write), bounding peak memory (model_exporter.rs:235-316);
* missing optional q/k norms are written as 1.0 vectors
  (model_exporter.rs:209-213);
* max reconstruction error tracked per tensor and reported overall
  (model_exporter.rs:312-313).

Two output formats: the TPU-native checkpoint directory (default; see
checkpoint.py) and the reference-compatible legacy single ``.bin``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ..checkpoint import NativeCheckpointWriter
from ..configuration import ModelConfig
from ..ops.quant import quantize_weights_np, quantize_weights_q4_np
from ..utils.progress import ProgressTracker
from .architectures import Qwen3Architecture, create_architecture
from .config_loader import ExportModelInfo
from .lora import LoraMerger
from .tensor_reader import TensorReader

logger = logging.getLogger(__name__)

MIN_GROUP_SIZE = 4  # model_exporter.rs:37


def find_optimal_group_size(hidden_dim: int, requested: int) -> int:
    """Largest size ≤ requested that divides hidden_dim, halving down, floor
    MIN_GROUP_SIZE (model_exporter.rs:48-57)."""
    size = min(requested, hidden_dim)
    while size >= MIN_GROUP_SIZE and hidden_dim % size != 0:
        size //= 2
    return max(size, MIN_GROUP_SIZE)


class BinaryModelExporter:
    """Streams, quantizes and writes model weights."""

    def __init__(self, model_info: ExportModelInfo, group_size: int, weight_bits: int = 8):
        config = model_info.config
        optimal = find_optimal_group_size(config.dim, group_size)
        if optimal != group_size:
            logger.info(
                "Adjusted group size from %d to %d to fit hidden_dim %d",
                group_size,
                optimal,
                config.dim,
            )
        self.model_info = model_info
        self.group_size = optimal
        self.weight_bits = weight_bits
        # Per-tensor {tensor, layer, max_err, bound} rows appended during
        # export; the accuracy harness asserts max_err ≤ bound for every
        # tensor (scripts/accuracy_report.py).
        self.error_report: list[dict] = []

    # ------------------------------------------------------------------ api
    def export(self, model_path: Path, output_path: Path, fmt: str = "native") -> ModelConfig:
        """Returns the final ModelConfig (with detected shared_classifier and
        fixed group size) for downstream artifact exporters."""
        tensor_reader = TensorReader(model_path)
        import dataclasses

        config = dataclasses.replace(
            self.model_info.config,
            group_size=self.group_size,
            weight_bits=self.weight_bits,
        ).validate()
        arch = create_architecture(config, tensor_reader)
        shared_classifier = arch.detect_shared_classifier()
        config = dataclasses.replace(config, shared_classifier=shared_classifier)

        lora_merger = None
        if self.model_info.is_lora:
            lora_merger = LoraMerger(
                tensor_reader, self.model_info.lora.lora_alpha, self.model_info.lora.r
            )

        if fmt == "native":
            self._export_native(config, arch, tensor_reader, lora_merger, output_path)
        elif fmt == "legacy":
            self._export_legacy(config, arch, tensor_reader, lora_merger, output_path)
        else:
            raise ValueError(f"Unknown export format: {fmt!r} (expected 'native' or 'legacy')")

        tensor_reader.clear_cache()
        return config

    # -------------------------------------------------------------- helpers
    def _iter_weight_tensors(self, config: ModelConfig, arch: Qwen3Architecture):
        """Yield (tensor_name, component, layer_idx, native_name) in the
        legacy serialization order (model_exporter.rs:243-260): embeddings,
        then each component with layer-major inner loop, then classifier."""
        yield arch.EMBED_TOKENS_KEY, None, None, "embed"
        for comp in arch.WEIGHT_COMPONENTS:
            for layer_idx in range(config.n_layers):
                yield (
                    arch.layer_tensor_name(comp.hf_component, layer_idx),
                    comp.hf_component,
                    layer_idx,
                    comp.native_name,
                )
        if not config.shared_classifier:
            yield arch.LM_HEAD_KEY, None, None, "lm_head"

    def _load_merged(self, tensor_reader, lora_merger, name, component, layer_idx):
        weight = tensor_reader.load_tensor(name)
        if weight is None:
            raise ValueError(f"Missing weight tensor: {name}")
        if lora_merger is not None and component is not None and layer_idx is not None:
            merged = lora_merger.try_merge(weight, component, layer_idx)
            if merged is not None:
                weight = merged
        return weight

    def _norm_entries(self, config: ModelConfig, arch: Qwen3Architecture, tensor_reader):
        """Yield (native_name, layer_idx, data) for every norm vector in the
        legacy order, defaulting optional ones to 1.0 (model_exporter.rs:194-232)."""
        for spec, native_name in zip(arch.NORM_WEIGHT_LAYERS, arch.NORM_NATIVE_NAMES):
            layer_range = range(config.n_layers) if spec.layered else [None]
            for layer_idx in layer_range:
                name = spec.name.replace("{}", str(layer_idx)) if spec.layered else spec.name
                data = tensor_reader.load_tensor(name)
                if data is None:
                    if spec.is_required:
                        raise ValueError(f"Missing weight for tensor_name: '{name}'")
                    data = np.ones(getattr(config, spec.default_len_attr), np.float32)
                yield native_name, layer_idx, data.reshape(-1).astype(np.float32)

    # --------------------------------------------------------------- native
    def _export_native(self, config, arch, tensor_reader, lora_merger, output_path: Path):
        writer = NativeCheckpointWriter(output_path, config)
        for native_name, layer_idx, data in self._norm_entries(config, arch, tensor_reader):
            writer.write_norm(native_name, data, layer_idx)

        from ..checkpoint import IN_MAJOR_TENSORS

        tensors = list(self._iter_weight_tensors(config, arch))
        progress = ProgressTracker(len(tensors), "Quantizing")
        max_error = 0.0
        for i, (name, component, layer_idx, native_name) in enumerate(tensors):
            progress.set_current(i + 1, name)
            weight = self._load_merged(tensor_reader, lora_merger, name, component, layer_idx)
            # INT4 (weight_bits=4) applies to the linear layers only —
            # embeddings/classifier keep Q8_0 (gathered per token / most
            # accuracy-sensitive, and a small share of the decode stream).
            if config.weight_bits == 4 and native_name in IN_MAJOR_TENSORS:
                q, s, err = quantize_weights_q4_np(weight, self.group_size)
            else:
                q, s, err = quantize_weights_np(weight, self.group_size)
            max_error = max(max_error, err)
            # Analytic per-tensor bound: round-to-nearest error ≤ half a
            # quantization step of the worst group — scale.max()/2 for
            # both Q8_0 (scale = amax/127) and Q4_0 (amax/7).  The
            # accuracy harness asserts err ≤ bound per tensor.
            self.error_report.append({
                "tensor": native_name,
                "layer": layer_idx,
                "max_err": float(err),
                "bound": float(np.max(s)) / 2.0,
            })
            writer.write_quantized(native_name, q, s, layer_idx)
        writer.close()
        progress.finish()
        logger.info(
            "Quantized %d weight tensors to Q%d_0 with max error: %.8f",
            len(tensors), config.weight_bits, max_error,
        )
        logger.info("Written model checkpoint to %s", output_path)

    # --------------------------------------------------------------- legacy
    def _export_legacy(self, config, arch, tensor_reader, lora_merger, output_path: Path):
        with open(output_path, "wb") as f:
            f.write(config.to_legacy_header())
            for _, _, data in self._norm_entries(config, arch, tensor_reader):
                f.write(data.astype("<f4").tobytes())

            tensors = list(self._iter_weight_tensors(config, arch))
            progress = ProgressTracker(len(tensors), "Quantizing")
            max_error = 0.0
            for i, (name, component, layer_idx, _) in enumerate(tensors):
                progress.set_current(i + 1, name)
                weight = self._load_merged(
                    tensor_reader, lora_merger, name, component, layer_idx
                )
                q, s, err = quantize_weights_np(weight.reshape(-1), self.group_size)
                max_error = max(max_error, err)
                self.error_report.append({
                    "tensor": name,
                    "layer": layer_idx,
                    "max_err": float(err),
                    "bound": float(np.max(s)) / 2.0,
                })
                # Per-tensor record: all int8 codes then all f32 scales
                # (model_exporter.rs:302-303).
                f.write(q.astype(np.int8).tobytes())
                f.write(s.astype("<f4").tobytes())
            progress.finish()
        logger.info(
            "Quantized %d weight tensors to Q8_0 with max error: %.8f", len(tensors), max_error
        )
        logger.info("Written model checkpoint to %s", output_path)
