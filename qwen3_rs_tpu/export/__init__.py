"""Export pipeline: HF model directory → quantized checkpoint + tokenizer +
chat templates.

Orchestration parity with qwen3-export/src/lib.rs:50-83 — detect model type,
export quantized weights, export tokenizer, export chat templates.
"""

from __future__ import annotations

import logging
from pathlib import Path

from .chat_template_exporter import ChatTemplateExporter
from .config_loader import ExportModelInfo, LoRAConfig, load_model_info
from .model_exporter import BinaryModelExporter, find_optimal_group_size
from .tokenizer_exporter import TokenizerExporter

logger = logging.getLogger(__name__)

__all__ = [
    "export_model",
    "load_model_info",
    "ExportModelInfo",
    "LoRAConfig",
    "BinaryModelExporter",
    "TokenizerExporter",
    "ChatTemplateExporter",
    "find_optimal_group_size",
]


def export_model(
    model_path: str | Path,
    output_path: str | Path,
    group_size: int = 64,
    fmt: str = "native",
    weight_bits: int = 8,
) -> list[dict]:
    """Full export: weights + tokenizer + chat templates
    (qwen3-export/src/lib.rs:50-83).

    ``fmt="native"`` writes the TPU checkpoint directory (tokenizer and
    templates live inside it); ``fmt="legacy"`` reproduces the reference's
    three sibling artifacts ``<out>.bin[.tokenizer|.template*]``.

    Returns the per-tensor quantization error report
    (``[{tensor, layer, max_err, bound}, ...]`` — round-to-nearest error
    vs the analytic half-step bound; scripts/accuracy_report.py asserts
    every row).
    """
    model_path = Path(model_path)
    output_path = Path(output_path)

    logger.info("Starting model export from %s", model_path)
    model_info = load_model_info(model_path)

    exporter = BinaryModelExporter(model_info, group_size, weight_bits)
    config = exporter.export(model_path, output_path, fmt=fmt)

    if fmt == "native":
        TokenizerExporter().export_tokenizer(
            model_path,
            output_path / "tokenizer.bin",
            model_info.bos_token_id,
            model_info.eos_token_id,
        )
        _try_export_templates(lambda: _export_templates_native(model_path, output_path))
    else:
        TokenizerExporter().export_tokenizer(
            model_path,
            Path(str(output_path) + ".tokenizer"),
            model_info.bos_token_id,
            model_info.eos_token_id,
        )
        _try_export_templates(
            lambda: ChatTemplateExporter().export_templates(model_path, output_path)
        )
    logger.info("Export complete: %s (group_size=%d)", output_path, config.group_size)
    return exporter.error_report


def _try_export_templates(fn) -> None:
    """Chat templates are best-effort: base models without a chat_template
    (or with an unrecognized style) still export weights+tokenizer; chat mode
    then degrades gracefully (tokenizer.rs:113-119 behavior).  The reference
    aborts the whole export instead — deliberate divergence."""
    try:
        fn()
    except ValueError as e:
        logger.warning("Chat template export skipped: %s", e)


def _export_templates_native(model_path: Path, output_dir: Path) -> None:
    """Write template files inside the native checkpoint directory with the
    same variant names minus the artifact prefix."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        base = Path(tmp) / "t"
        ChatTemplateExporter().export_templates(model_path, base)
        for produced in sorted(Path(tmp).glob("t.template*")):
            # "t.template.with-system" -> "template.with-system"
            target = output_dir / produced.name[2:]
            target.write_text(produced.read_text())
