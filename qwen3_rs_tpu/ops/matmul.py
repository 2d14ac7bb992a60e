"""Group-wise quantized matmuls.

TPU-native counterpart of the reference W8A8 matmul
(qwen3-inference/src/tensor.rs:23-62): per (row, group) an int8·int8→int32
dot, scaled by ``w_scale * x_scale`` in f32 and summed across groups.

Weight convention (in-memory, for linear layers): **transposed / in-major**:
``w.q`` has shape ``[in_dim, out_dim]`` and ``w.scales`` has shape
``[in_dim // group_size, out_dim]`` — groups subdivide the contraction axis,
which lands on the MXU's sublane-major operand and lets the Pallas kernel
broadcast per-group scales for free (a sublane-major broadcast+reshape).
The on-disk checkpoint format keeps the reference's row-major ``[out, in]``
layout; the loader transposes once at load time (checkpoint.py).

Two device paths:

* ``qmatmul_exact`` — numerically mirrors the reference (int32 per-group
  dots, f32 cross-group accumulation over a ``lax.scan``).
* ``qmatmul`` — the production path: weights stay INT8 in HBM (decode is
  memory bound — the HBM bytes are what matter) and are dequantized on the
  fly into the matmul (Pallas kernel on TPU, fused XLA elsewhere).
  Activations stay bf16/f32 (W8A16): same weight bytes as the reference's
  W8A8, strictly lower quantization error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor


def qmatmul_exact(x: QuantizedTensor, w: QuantizedTensor) -> jax.Array:
    """Reference-exact W8A8 grouped matmul.

    x.q: [..., N] int8, x.scales: [..., G]; w.q: [N, D] int8 (in-major),
    w.scales: [G, D] → f32 [..., D], matching compute_matmul_row
    (qwen3-inference/src/tensor.rs:32-62): per-group int32 dot × scales,
    accumulated in f32 across groups.
    """
    n = x.q.shape[-1]
    wn, d = w.q.shape
    assert n == wn, (x.q.shape, w.q.shape)
    g_count = w.scales.shape[0]
    group_size = n // g_count

    batch_shape = x.q.shape[:-1]
    batch_rows = 1
    for dim in batch_shape:
        batch_rows *= dim
    from . import pallas as pallas_ops

    if pallas_ops.pallas_enabled():
        from .pallas.qmatmul import qmatmul_pallas_stacked_rows_a8, rows_a8_supported

        # Same math at MXU width: per-group int8 dots with the reference's
        # epilogue scale order, one kernel instead of a G-step lax.scan.
        if batch_rows >= 128 and rows_a8_supported(n, d, group_size, batch_rows):
            return qmatmul_pallas_stacked_rows_a8(x, QuantizedTensor(w.q[None], w.scales[None]), 0)
    xq = x.q.reshape(-1, g_count, group_size)
    xs = x.scales.reshape(-1, g_count)
    wq = w.q.reshape(g_count, group_size, d)

    def step(acc, inputs):
        xq_g, xs_g, wq_g, ws_g = inputs
        # int8 × int8 → int32 on the MXU.
        dot = jax.lax.dot_general(
            xq_g,
            wq_g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, D]
        acc = acc + dot.astype(jnp.float32) * xs_g[:, None] * ws_g[None, :]
        return acc, None

    init = jnp.zeros((xq.shape[0], d), jnp.float32)
    inputs = (
        jnp.moveaxis(xq, 1, 0),  # [G, B, g]
        jnp.moveaxis(xs, 1, 0),  # [G, B]
        wq,  # [G, g, D]
        w.scales,  # [G, D]
    )
    out, _ = jax.lax.scan(step, init, inputs)
    return out.reshape(*batch_shape, d)


def dequant_weights(w: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize in-major codes to a dense [N, D] matrix."""
    n, d = w.q.shape
    g_count = w.scales.shape[0]
    group_size = n // g_count
    wf = w.q.reshape(g_count, group_size, d).astype(jnp.float32)
    wf = wf * w.scales[:, None, :]
    return wf.reshape(n, d).astype(dtype)


def transpose_quantized(w: QuantizedTensor) -> QuantizedTensor:
    """Row-major storage ([D, N] codes, [D, G] scales — the checkpoint and
    reference layout) → in-major compute layout ([N, D], [G, D])."""
    return QuantizedTensor(w.q.T, w.scales.T)


def qmatmul(x: jax.Array, w: QuantizedTensor, *, use_pallas: bool | None = None) -> jax.Array:
    """Production quantized matmul: f32/bf16 activations × INT8 weights.

    x: [..., N] float; w.q: [N, D] int8 (in-major) → [..., D] f32.
    """
    from . import pallas as pallas_ops

    n, d = w.q.shape
    g_count = w.scales.shape[0]
    group_size = n // g_count
    batch_rows = 1
    for dim in x.shape[:-1]:
        batch_rows *= dim
    if use_pallas is None:
        from .pallas.qmatmul import supports_shapes

        # The kernel keeps the whole [rows, tile] activation/output blocks in
        # VMEM — fine for decode/small prefill buckets, not for long prefill
        # windows (compute-bound there anyway; XLA handles them well).
        use_pallas = (
            pallas_ops.pallas_enabled()
            and batch_rows <= 256
            and supports_shapes(n, d, group_size)
        )
    if use_pallas:
        return pallas_ops.qmatmul_pallas(x, w)

    batch_shape = x.shape[:-1]
    if batch_rows >= 512:
        # Long prefill windows are compute bound: dequantize once and run a
        # single MXU-saturating contraction (the per-group form below would
        # issue G separate K=64 dots — poor MXU utilization).
        wf = dequant_weights(w, jnp.bfloat16)
        out = jax.lax.dot_general(
            x.reshape(-1, n).astype(jnp.bfloat16),
            wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(*batch_shape, d)

    xf = x.reshape(-1, g_count, group_size).astype(jnp.float32)
    wq = w.q.reshape(g_count, group_size, d)
    # Per-group contraction with the weight scale applied afterwards:
    # out = Σ_G (x_G · wq_G) * ws_G.
    dots = jax.lax.dot_general(
        xf,
        wq.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, B, D]
    out = jnp.einsum("gbd,gd->bd", dots, w.scales, preferred_element_type=jnp.float32)
    return out.reshape(*batch_shape, d)
