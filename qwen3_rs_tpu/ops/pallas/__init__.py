"""Pallas/Mosaic TPU kernels — the TPU-native "hand-written kernel" layer.

This package replaces what the reference implements as hand-rolled Rust inner
loops (qwen3-inference/src/tensor.rs matmul, layers.rs attention): fused
dequant+matmul and flash-style GQA attention, written against the MXU/VPU.

Kernels are enabled automatically on TPU backends; every caller has an XLA
fallback so the same model code runs on CPU meshes in tests.  Set
``QWEN3_TPU_DISABLE_PALLAS=1`` to force the fallbacks.
"""

from __future__ import annotations

import functools
import os

import jax


@functools.cache
def pallas_enabled() -> bool:
    if os.environ.get("QWEN3_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def qmatmul_pallas(x, w):
    from .qmatmul import qmatmul_pallas as _impl

    return _impl(x, w)


def qmatmul_pallas_stacked(x, w, layer_idx):
    from .qmatmul import qmatmul_pallas_stacked as _impl

    return _impl(x, w, layer_idx)


def qmatmul_pallas_stacked_rows(x, w, layer_idx):
    from .qmatmul import qmatmul_pallas_stacked_rows as _impl

    return _impl(x, w, layer_idx)


def qmatmul_pallas_stacked_fused(x, w, layer_idx, **kw):
    from .qmatmul import qmatmul_pallas_stacked_fused as _impl

    return _impl(x, w, layer_idx, **kw)


def flash_gqa_attention(q, k, v, q_pos):
    from .flash_attention import flash_gqa_attention as _impl

    return _impl(q, k, v, q_pos)
