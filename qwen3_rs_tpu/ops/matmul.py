"""Group-wise quantized matmuls.

TPU-native counterpart of the reference W8A8 matmul
(qwen3-inference/src/tensor.rs:23-62): per (row, group) an int8·int8→int32
dot, scaled by ``w_scale * x_scale`` in f32 and summed across groups.

Two device paths are provided:

* ``qmatmul_exact`` — numerically mirrors the reference (int32 per-group dots,
  f32 cross-group accumulation).  Used by parity tests and available as an
  engine mode.  Implemented as a ``lax.scan`` over groups so activations of
  any batch/sequence size stay O(out_dim) in memory.
* ``qmatmul`` — the production path: weights stay INT8 in HBM (the HBM
  bandwidth win is what matters — decode is memory bound) and are dequantized
  on the fly into the matmul.  When the Pallas kernel is available it fuses
  dequant+matmul in VMEM; otherwise XLA's fusion of the convert+scale into the
  dot is used.  Activations are kept in higher precision (W8A16-style), which
  is strictly more accurate than the reference's W8A8 while reading the same
  number of weight bytes.

Weight convention: ``w.q`` has shape ``[out_dim, in_dim]`` (row-major, same
logical layout as the reference; each row contracts against the input),
``w.scales`` has shape ``[out_dim, in_dim // group_size]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor


def qmatmul_exact(x: QuantizedTensor, w: QuantizedTensor) -> jax.Array:
    """Reference-exact W8A8 grouped matmul.

    x.q: [..., N] int8, x.scales: [..., G]; w.q: [D, N] int8, w.scales: [D, G]
    → f32 [..., D], matching compute_matmul_row
    (qwen3-inference/src/tensor.rs:32-62): per-group int32 dot × scales,
    accumulated in f32 across groups.
    """
    n = x.q.shape[-1]
    d, wn = w.q.shape
    assert n == wn, (x.q.shape, w.q.shape)
    g_count = w.scales.shape[-1]
    group_size = n // g_count

    batch_shape = x.q.shape[:-1]
    xq = x.q.reshape(-1, g_count, group_size)
    xs = x.scales.reshape(-1, g_count)
    wq = w.q.reshape(d, g_count, group_size)
    ws = w.scales  # [D, G]

    def step(acc, inputs):
        xq_g, xs_g, wq_g, ws_g = inputs
        # int8 × int8 → int32 on the MXU.
        dot = jax.lax.dot_general(
            xq_g,
            wq_g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, D]
        acc = acc + dot.astype(jnp.float32) * xs_g[:, None] * ws_g[None, :]
        return acc, None

    init = jnp.zeros((xq.shape[0], d), jnp.float32)
    inputs = (
        jnp.moveaxis(xq, 1, 0),  # [G, B, g]
        jnp.moveaxis(xs, 1, 0),  # [G, B]
        jnp.moveaxis(wq, 1, 0),  # [G, D, g]
        jnp.moveaxis(ws, 1, 0),  # [G, D]
    )
    out, _ = jax.lax.scan(step, init, inputs)
    return out.reshape(*batch_shape, d)


def dequant_weights_T(w: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize [D, N] weight codes to a dense [N, D] matrix."""
    d, n = w.q.shape
    g_count = w.scales.shape[-1]
    group_size = n // g_count
    wf = w.q.reshape(d, g_count, group_size).astype(jnp.float32)
    wf = wf * w.scales[..., None]
    return wf.reshape(d, n).astype(dtype).T


def qmatmul(x: jax.Array, w: QuantizedTensor, *, use_pallas: bool | None = None) -> jax.Array:
    """Production quantized matmul: f32/bf16 activations × INT8 weights.

    x: [..., N] float; w.q: [D, N] int8 → [..., D] f32.

    Dequantization is fused into the contraction (Pallas on TPU, XLA fusion
    elsewhere); weights are read from HBM as int8.
    """
    from . import pallas as pallas_ops

    d, n = w.q.shape
    if use_pallas is None:
        from .pallas.qmatmul import supports_shapes

        use_pallas = pallas_ops.pallas_enabled() and supports_shapes(
            n, d, n // w.scales.shape[-1]
        )
    if use_pallas:
        return pallas_ops.qmatmul_pallas(x, w)
    g_count = w.scales.shape[-1]
    group_size = n // g_count
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, g_count, group_size).astype(jnp.float32)
    wq = w.q.reshape(d, g_count, group_size)
    # Contract int8 codes against float activations with the weight scale
    # applied per (row, group) afterwards: out = Σ_G (x_G · wq_G) * ws_G.
    dots = jax.lax.dot_general(
        xf,
        wq.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((1,), (1,))),
        preferred_element_type=jnp.float32,
    )  # [G, B, D]
    out = jnp.einsum("gbd,dg->bd", dots, w.scales, preferred_element_type=jnp.float32)
    return out.reshape(*batch_shape, d)
