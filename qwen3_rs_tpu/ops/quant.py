"""Group-wise symmetric INT8 (Q8_0-style) quantization.

TPU-native reimplementation of the reference quantization scheme:

* Weight quantization (export time): per-group scale ``max_abs/127`` (1.0 for
  an all-zero group), values rounded **half-to-even** and clamped to ±127 —
  qwen3-export/src/model_exporter.rs:104-161 and :320-338.  ``jnp.round`` /
  ``np.round`` are half-to-even already, so this matches for free.
* Activation quantization (inference time): per-group scale ``max_abs/127``
  (0.0 for an all-zero group, producing zero codes), values rounded
  **half-away-from-zero** (Rust ``f32::round``) —
  qwen3-inference/src/tensor.rs:91-119.
* Dequantization: ``q * scale`` broadcast per group —
  qwen3-inference/src/tensor.rs:72-80.

Unlike the reference's flat 1-D buffers, tensors here keep their logical
shape; groups always subdivide the **last** axis, which is the contraction
axis of every quantized matmul.  That gives a layout XLA can tile directly
onto the MXU: ``q[..., G, g]`` with ``scales[..., G]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Q_MAX = 127.0


class QuantizedTensor(NamedTuple):
    """Pytree of int8 codes + per-group f32 scales.

    Counterpart of the reference ``QuantizedTensor``
    (qwen3-inference/src/tensor.rs:4-21).  ``q`` has the tensor's logical
    shape; ``scales`` has the same shape with the last axis divided by
    ``group_size``.
    """

    q: jax.Array  # int8, shape [..., N]
    scales: jax.Array  # float32, shape [..., N // group_size]

    @property
    def group_size(self) -> int:
        return self.q.shape[-1] // self.scales.shape[-1]

    @property
    def shape(self):
        return self.q.shape


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Round half away from zero, matching Rust ``f32::round``
    (used by activation quant, qwen3-inference/src/tensor.rs:116)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def quantize_activations(x: jax.Array, group_size: int) -> QuantizedTensor:
    """Per-group activation quantization (qwen3-inference/src/tensor.rs:91-119).

    scale = max_abs/127 (0 for an all-zero group → zero codes),
    q = round_half_away(x/scale).
    """
    orig_shape = x.shape
    assert orig_shape[-1] % group_size == 0, (orig_shape, group_size)
    g = x.reshape(*orig_shape[:-1], orig_shape[-1] // group_size, group_size)
    g = g.astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=-1)
    scale = amax / Q_MAX
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = _round_half_away(g / safe[..., None])
    q = jnp.where(scale[..., None] == 0.0, 0.0, q).astype(jnp.int8)
    return QuantizedTensor(q.reshape(orig_shape), scale)


def quantize_weights_np(w: np.ndarray, group_size: int) -> tuple[np.ndarray, np.ndarray, float]:
    """Host-side Q8_0 weight quantization for the exporter.

    Mirrors quantize_q80 (qwen3-export/src/model_exporter.rs:104-161):
    half-to-even rounding, clamp ±127, scale 1.0 for all-zero groups.
    Returns (int8 codes, f32 scales, max reconstruction error).
    """
    orig_shape = w.shape
    if w.size % group_size != 0:
        raise ValueError("Weight length is not a multiple of group_size")
    g = np.ascontiguousarray(w, dtype=np.float32).reshape(-1, group_size)
    amax = np.max(np.abs(g), axis=-1)
    scale = np.where(amax > 0.0, amax / Q_MAX, 1.0).astype(np.float32)
    # np.round is round-half-to-even — matches the reference's banker's rounding.
    q = np.clip(np.round(g / scale[:, None]), -Q_MAX, Q_MAX).astype(np.int8)
    recon = q.astype(np.float32) * scale[:, None]
    max_error = float(np.max(np.abs(recon - g))) if g.size else 0.0
    q = q.reshape(orig_shape)
    scale = scale.reshape(*orig_shape[:-1], orig_shape[-1] // group_size)
    return q, scale, max_error


def quantize_weights(w: jax.Array, group_size: int) -> QuantizedTensor:
    """Device-side Q8_0 weight quantization (same math as quantize_weights_np)."""
    orig_shape = w.shape
    assert orig_shape[-1] % group_size == 0
    g = w.astype(jnp.float32).reshape(*orig_shape[:-1], orig_shape[-1] // group_size, group_size)
    amax = jnp.max(jnp.abs(g), axis=-1)
    scale = jnp.where(amax > 0.0, amax / Q_MAX, 1.0)
    q = jnp.clip(jnp.round(g / scale[..., None]), -Q_MAX, Q_MAX).astype(jnp.int8)
    return QuantizedTensor(q.reshape(orig_shape), scale)


# ------------------------------------------------------------------ INT4
# Q4_0-style 4-bit weights — a TPU-first extension beyond the reference's
# Q8_0 (decode throughput is HBM-bound on the weight stream, so halving the
# code bytes nearly doubles the single-stream roofline).  Same group-wise
# symmetric scheme with Q_MAX = 7.
#
# Packing: two codes per byte, **split-half within each group along the
# in (sublane) axis**: for a group of g in-rows, packed byte-row j holds
# in-row j in its low nibble and in-row j + g/2 in its high nibble
# (j < g/2).  Unpacking is then two full-width nibble extractions
# concatenated on the sublane axis — no lane/sublane interleave, which
# Mosaic cannot lower cheaply.  Packed codes: uint8 ``[..., N/2, D]``
# against scales ``[..., N/g, D]`` in the in-major weight layout.

Q4_MAX = 7.0


class Q4Tensor(NamedTuple):
    """Pytree of nibble-packed int4 codes + per-group scales (in-major
    weight layout only: groups subdivide axis -2)."""

    q: jax.Array  # uint8 packed, shape [..., N // 2, D]
    scales: jax.Array  # f32/bf16, shape [..., N // group_size, D]

    @property
    def group_size(self) -> int:
        return 2 * self.q.shape[-2] // self.scales.shape[-2]

    @property
    def shape(self):
        # Logical (unpacked) shape.
        return (*self.q.shape[:-2], 2 * self.q.shape[-2], self.q.shape[-1])


#: Q4 nibble bias ("biased-v2" packing): stored nibble = code + 8, so both
#: halves unpack as UNSIGNED extractions minus a constant — no sign
#: extension.  That is what makes the kernels' float-arithmetic unpack
#: (qmatmul._dequant_tile_q4) possible: bytes convert to bf16 exactly
#: (≤ 255 < 2^8), the halves split with one floor-divide, and the -8 is
#: an exact bf16 subtract — the decode-critical VPU pass count roughly
#: halves vs sign-extending shifts in int32.
Q4_BIAS = 8


def pack_q4_np(q: np.ndarray, group_size: int) -> np.ndarray:
    """int8 codes [..., N, D] in [-7, 7] → packed uint8 [..., N/2, D]
    (group split-half along axis -2; biased-v2: nibble = code + 8)."""
    n = q.shape[-2]
    assert n % group_size == 0 and group_size % 2 == 0, (q.shape, group_size)
    h = group_size // 2
    g = q.reshape(*q.shape[:-2], n // group_size, group_size, q.shape[-1])
    lo = (g[..., :h, :] + Q4_BIAS).astype(np.uint8) & 0xF
    hi = ((g[..., h:, :] + Q4_BIAS).astype(np.uint8) & 0xF) << 4
    return (lo | hi).reshape(*q.shape[:-2], n // 2, q.shape[-1])


def unpack_q4_np(packed: np.ndarray, group_size: int) -> np.ndarray:
    """Packed uint8 [..., N/2, D] → int8 codes [..., N, D]."""
    h = group_size // 2
    n2 = packed.shape[-2]
    g = packed.reshape(*packed.shape[:-2], n2 // h, h, packed.shape[-1])
    lo = (g & 0xF).astype(np.int8) - Q4_BIAS
    hi = (g >> 4).astype(np.int8) - Q4_BIAS
    out = np.concatenate([lo, hi], axis=-2)
    return out.reshape(*packed.shape[:-2], 2 * n2, packed.shape[-1])


def unpack_q4(packed: jax.Array, group_size: int, dtype=jnp.bfloat16) -> jax.Array:
    """jnp unpack (XLA fallback path): packed [..., N/2, D] → codes [..., N, D]."""
    h = group_size // 2
    n2 = packed.shape[-2]
    g = packed.reshape(*packed.shape[:-2], n2 // h, h, packed.shape[-1]).astype(jnp.int32)
    lo = (g & 0xF) - Q4_BIAS
    hi = (g >> 4) - Q4_BIAS  # uint8 origin → logical shift
    out = jnp.concatenate([lo, hi], axis=-2)
    return out.reshape(*packed.shape[:-2], 2 * n2, packed.shape[-1]).astype(dtype)


def quantize_weights_q4_np(
    w: np.ndarray, group_size: int
) -> tuple[np.ndarray, np.ndarray, float]:
    """Host-side Q4_0 weight quantization (row-major [..., N] like
    quantize_weights_np; groups subdivide the LAST axis).  Returns unpacked
    int8 codes in [-7, 7] — packing happens at the in-major layout stage
    (pack_q4_np) where the group axis is -2."""
    orig_shape = w.shape
    if w.size % group_size != 0:
        raise ValueError("Weight length is not a multiple of group_size")
    g = np.ascontiguousarray(w, dtype=np.float32).reshape(-1, group_size)
    amax = np.max(np.abs(g), axis=-1)
    scale = np.where(amax > 0.0, amax / Q4_MAX, 1.0).astype(np.float32)
    q = np.clip(np.round(g / scale[:, None]), -Q4_MAX, Q4_MAX).astype(np.int8)
    recon = q.astype(np.float32) * scale[:, None]
    max_error = float(np.max(np.abs(recon - g))) if g.size else 0.0
    q = q.reshape(orig_shape)
    scale = scale.reshape(*orig_shape[:-1], orig_shape[-1] // group_size)
    return q, scale, max_error


def dequantize_q4_inmajor(qt: Q4Tensor, dtype=jnp.float32) -> jax.Array:
    """Unpack + per-group dequant for an in-major Q4Tensor
    ([..., N/2, D] packed, scales [..., G, D]) → [..., N, D]."""
    g = qt.group_size
    codes = unpack_q4(qt.q, g, dtype=jnp.float32)  # [..., N, D]
    n, d = codes.shape[-2], codes.shape[-1]
    grp = codes.reshape(*codes.shape[:-2], n // g, g, d)
    out = grp * qt.scales[..., :, None, :].astype(jnp.float32)
    return out.reshape(*codes.shape[:-2], n, d).astype(dtype)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """q * per-group scale (qwen3-inference/src/tensor.rs:72-80)."""
    group_size = qt.group_size
    shape = qt.q.shape
    g = qt.q.reshape(*shape[:-1], shape[-1] // group_size, group_size).astype(jnp.float32)
    out = g * qt.scales[..., None].astype(jnp.float32)
    return out.reshape(shape).astype(dtype)


def dequantize_np(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    group_size = q.shape[-1] // scales.shape[-1]
    g = q.astype(np.float32).reshape(*q.shape[:-1], scales.shape[-1], group_size)
    return (g * scales[..., None].astype(np.float32)).reshape(q.shape)
