"""Fused dequant+matmul Pallas kernel.

The TPU-native replacement for the reference's hand-rolled W8A8 row loop
(qwen3-inference/src/tensor.rs:23-62).  Weights stream HBM→VMEM as INT8 (the
memory-bound decode path reads exactly 1 byte/param + 1 f32 scale per group)
and the per-group scale is applied to the MXU dot *result* — no dense
f32/bf16 weight matrix ever exists in HBM.

Math per (out-tile i, in-tile k):
    out[b, d] += Σ_j  (x[b, G_j] · wq[d, G_j])  *  ws[G_j, d]
one MXU dot per group slab (K = group_size), scaled in the [B, TILE_D]
output domain where the scale row broadcasts for free.  Scales travel in
transposed ``[G, D]`` layout so every block and slice is static — Mosaic's
lane-tiling rules forbid dynamic lane offsets on the ``[D, G]`` layout.

Grid: (out_tiles, in_tiles); the output block stays VMEM-resident across the
in-tile sweep and accumulates in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QuantizedTensor


def _kernel(x_ref, wq_ref, ws_t_ref, out_ref, *, group_size: int, tile_groups: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # [B, TILE_N] f32
    wq = wq_ref[:]  # [TILE_D, TILE_N] int8
    acc = jnp.zeros_like(out_ref)
    for j in range(tile_groups):
        sl = slice(j * group_size, (j + 1) * group_size)
        # int8 codes are exact in the MXU's bf16 input path (|q| ≤ 127 < 2^8).
        dot_j = jax.lax.dot_general(
            x[:, sl],
            wq[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, TILE_D]
        acc = acc + dot_j * ws_t_ref[j : j + 1, :]  # scale row broadcasts over B
    out_ref[:] += acc


def _pick_tile(dim: int, candidates) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def supports_shapes(n: int, d: int, group_size: int) -> bool:
    """Whether the kernel's tiling constraints cover this (in, out) shape —
    callers fall back to the XLA path otherwise (e.g. tiny test models)."""
    tile_n = _pick_tile(n, (512, 256, 128))
    return (
        _pick_tile(d, (512, 256, 128)) is not None
        and tile_n is not None
        and tile_n % group_size == 0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_2d(x, wq, ws_t, *, interpret: bool = False):
    """x [B, N] f32, wq [D, N] int8, ws_t [G, D] f32 → [B, D] f32."""
    b, n = x.shape
    d, _ = wq.shape
    g_count = ws_t.shape[0]
    group_size = n // g_count

    tile_d = _pick_tile(d, (512, 256, 128))
    tile_n = _pick_tile(n, (512, 256, 128))
    if tile_d is None or tile_n is None or tile_n % group_size != 0:
        raise ValueError(f"unsupported shapes for pallas qmatmul: {x.shape} x {wq.shape}")
    tile_groups = tile_n // group_size

    grid = (d // tile_d, n // tile_n)
    kernel = functools.partial(_kernel, group_size=group_size, tile_groups=tile_groups)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tile_n), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, tile_n), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_groups, tile_d), lambda i, k: (k, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((b, tile_d), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(x, wq, ws_t)


def qmatmul_pallas(x: jax.Array, w: QuantizedTensor, *, interpret: bool = False) -> jax.Array:
    """x [..., N] float × w([D, N] int8, [D, G] f32) → [..., D] f32."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    # Transposed scales: [G, D].  TODO(perf): cache the transposed layout in
    # the weight pytree to save ~6% of decode HBM traffic.
    out = _qmatmul_2d(x2, w.q, w.scales.T, interpret=interpret)
    return out.reshape(*batch_shape, w.q.shape[0])
