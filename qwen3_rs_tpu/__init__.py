"""qwen3_rs_tpu — a TPU-native quantized-inference framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capability surface of
reinterpretcat/qwen3-rs (HF→INT8-g64 exporter + Qwen3-family inference
engine), designed TPU-first: batched jit-compiled prefill/decode, Pallas
kernels for the quantized matmul and attention hot paths, and
``jax.sharding`` tensor/data parallelism in place of the reference's
single-CPU rayon loops.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

from .configuration import ModelConfig, read_config
from .checkpoint import load_checkpoint
from .export import export_model
from .inference import Engine, Tokenizer, TokenSampler, chat, generate

__version__ = "0.1.0"


@dataclasses.dataclass
class InferenceConfig:
    """Capability parity with the reference public API
    (qwen3-inference/src/lib.rs:24-106): same fields, same defaults
    (temperature 1.0, top-p 0.9, chat mode, thinking off, seed=unix time)."""

    checkpoint_path: str
    temperature: float = 1.0
    topp: float = 0.9
    ctx_length: Optional[int] = None
    mode: str = "chat"
    prompt: Optional[str] = None
    system_prompt: Optional[str] = None
    enable_thinking: bool = False
    seed: Optional[int] = None
    # TPU-native extensions (no reference counterpart):
    engine_mode: str = "fast"  # "fast" (W8A16 + Pallas) | "exact" (reference W8A8)
    device_sampling: bool = False  # sample on device instead of host xorshift
    kv_int8: bool = False  # INT8 KV cache (per-row scales; halves KV reads)
    speculative: int = 0  # n-gram draft length k (greedy-exact; 0 = off)
    sp: int = 1  # sequence-parallel devices: fresh prefills >= sp_threshold
    # rows run ring attention over an sp mesh (parallel/context.py)
    sp_threshold: int = 4096  # min prompt rows to engage the sp prefill

    def __post_init__(self):
        if self.seed is None:
            self.seed = int(time.time())


def run_inference(config: InferenceConfig) -> None:
    """Wire transformer + tokenizer + sampler and dispatch on mode
    (qwen3-inference/src/lib.rs:109-138)."""
    if config.speculative > 0:
        # Speculative decoding is greedy-exact only (speculative.py).
        if config.temperature != 0.0:
            raise ValueError(
                "speculative decoding requires temperature 0 (greedy); "
                f"got temperature={config.temperature}"
            )
        if config.mode != "generate":
            raise ValueError("speculative decoding is generate-mode only")
        # Greedy device sampling == greedy host sampling (both last-max
        # argmax, ops/sampling.py:argmax_last_jax matching the host's
        # _argmax_last), so auto-enabling it changes nothing but dispatch.
        config.device_sampling = True
    engine_kwargs = {}
    if config.kv_int8:
        engine_kwargs["cache_dtype"] = "int8"
    if config.sp > 1:
        # Sequence-parallel prefill mesh: prompts past sp_threshold rows
        # shard over these devices via ring attention; decode and short
        # prefills stay single-chip.
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from .parallel.context import SP_AXIS

        n_dev = len(jax.devices())
        if config.sp > n_dev:
            raise ValueError(f"--sp {config.sp} needs {config.sp} devices, have {n_dev}")
        engine_kwargs["sp_mesh"] = Mesh(
            np.asarray(jax.devices()[: config.sp]), (SP_AXIS,)
        )
        engine_kwargs["sp_threshold"] = config.sp_threshold
    engine = Engine(
        config.checkpoint_path,
        ctx_length=config.ctx_length,
        mode=config.engine_mode,
        **engine_kwargs,
    )
    tokenizer = Tokenizer(
        config.checkpoint_path, engine.config.vocab_size, config.enable_thinking
    )
    sampler = TokenSampler(
        config.temperature, config.topp, config.seed, device=config.device_sampling
    )
    if config.mode == "generate":
        generate(engine, tokenizer, sampler, config.prompt, spec_k=config.speculative)
    elif config.mode == "chat":
        chat(engine, tokenizer, sampler, config.prompt, config.system_prompt)
    else:
        raise ValueError(f"Unknown mode: {config.mode}")


__all__ = [
    "ModelConfig",
    "InferenceConfig",
    "read_config",
    "load_checkpoint",
    "export_model",
    "run_inference",
    "Engine",
    "Tokenizer",
    "TokenSampler",
    "generate",
    "chat",
    "__version__",
]
