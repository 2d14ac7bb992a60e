"""Flash-style GQA decode attention (Pallas).

TPU-native replacement for the reference's per-head attention walk
(qwen3-inference/src/layers.rs:374-419).  For the decode step (S = 1) the
kernel streams each kv head's contiguous ``[T, head_dim]`` cache slab
HBM→VMEM in blocks with a **position-bounded** loop — only ``pos`` rows are
ever read, where the XLA fallback must scan the whole allocated window —
and reduces with an online softmax.  The current token's K/V (the "self"
key, not yet written to the cache) seeds the running max/denominator, so
the output is exactly the split attention of ops/attention.py.

Like the quantized matmul, the kernel takes the **full stacked cache**
``[L, B, n_kv, T, hd]`` plus the layer index as a scalar-prefetch argument:
the layer scan never slices (= copies) the cache.

Grid: (B, n_kv) — one program per (request, kv head), covering that head's
``kv_mul`` query heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_T = 2048  # cache rows per DMA block


def _kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    pos_ref,  # [B] int32 — number of valid cache rows (decode position)
    # inputs
    q_ref,  # [1, 1, kv_mul, hd] f32 (VMEM block)
    kn_ref,  # [1, 1, 1, hd] f32 — self key
    vn_ref,  # [1, 1, 1, hd] f32 — self value
    k_all_ref,  # [L, B, n_kv, T, hd] (HBM)
    v_all_ref,  # [L, B, n_kv, T, hd] (HBM)
    # output
    out_ref,  # [1, 1, kv_mul, hd] f32
    *,
    scale: float,
):
    b = pl.program_id(0)
    kvh = pl.program_id(1)
    layer = layer_ref[0]
    p = pos_ref[b]

    q = q_ref[0, 0] * scale  # [kv_mul, hd]
    kn = kn_ref[0, 0]  # [1, hd]
    vn = vn_ref[0, 0]  # [1, hd]

    def body(k_buf, v_buf, sem_k, sem_v):
        # Online softmax seeded with the self key: m = s_self, denom = 1,
        # acc = v_self.
        s_self = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [kv_mul, 1]
        m0 = s_self
        denom0 = jnp.ones_like(s_self)
        acc0 = jnp.broadcast_to(vn, q.shape).astype(jnp.float32)  # [kv_mul, hd]

        n_blocks = pl.cdiv(p, BLK_T)

        def start_dma(j, slot):
            t0 = j * BLK_T
            cp_k = pltpu.make_async_copy(
                k_all_ref.at[layer, b, kvh, pl.ds(t0, BLK_T), :], k_buf.at[slot], sem_k.at[slot]
            )
            cp_v = pltpu.make_async_copy(
                v_all_ref.at[layer, b, kvh, pl.ds(t0, BLK_T), :], v_buf.at[slot], sem_v.at[slot]
            )
            cp_k.start()
            cp_v.start()
            return cp_k, cp_v

        @pl.when(n_blocks > 0)
        def _():
            start_dma(0, 0)

        def step(j, carry):
            m, denom, acc = carry
            slot = jax.lax.rem(j, 2)

            # Prefetch block j+1 while j is in flight / being consumed.
            @pl.when(j + 1 < n_blocks)
            def _():
                start_dma(j + 1, 1 - slot)

            pltpu.make_async_copy(
                k_all_ref.at[layer, b, kvh, pl.ds(j * BLK_T, BLK_T), :],
                k_buf.at[slot],
                sem_k.at[slot],
            ).wait()
            pltpu.make_async_copy(
                v_all_ref.at[layer, b, kvh, pl.ds(j * BLK_T, BLK_T), :],
                v_buf.at[slot],
                sem_v.at[slot],
            ).wait()

            scores = jax.lax.dot_general(
                q,
                k_buf[slot].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [kv_mul, BLK_T]
            t_idx = j * BLK_T + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(t_idx < p, scores, -jnp.inf)

            m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            probs = jnp.exp(scores - m_new)
            denom = denom * corr + jnp.sum(probs, axis=1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                probs,
                v_buf[slot].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, denom, acc

        m, denom, acc = jax.lax.fori_loop(0, n_blocks, step, (m0, denom0, acc0))
        out_ref[0, 0] = acc / denom

    hd = q_ref.shape[-1]
    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, BLK_T, hd), k_all_ref.dtype),
        v_buf=pltpu.VMEM((2, BLK_T, hd), v_all_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_gqa_decode_stacked(
    q: jax.Array,  # [B, n_heads, hd] f32
    k_new: jax.Array,  # [B, n_kv, hd]
    v_new: jax.Array,  # [B, n_kv, hd]
    k_all: jax.Array,  # [L, B, n_kv, T, hd]
    v_all: jax.Array,  # [L, B, n_kv, T, hd]
    pos: jax.Array,  # [B] int32 — cache rows < pos are valid
    layer_idx,  # scalar int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over cache prefix + self key → [B, n_heads, hd]."""
    b, n_heads, hd = q.shape
    n_kv = k_all.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (hd**0.5)

    q4 = q.reshape(b, n_kv, kv_mul, hd).astype(jnp.float32)
    kn4 = k_new.reshape(b, n_kv, 1, hd).astype(jnp.float32)
    vn4 = v_new.reshape(b, n_kv, 1, hd).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, kv_mul, hd), lambda i, j, l, p: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, hd), lambda i, j, l, p: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, hd), lambda i, j, l, p: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # k_all stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v_all stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, kv_mul, hd), lambda i, j, l, p: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, kv_mul, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32),
        q4,
        kn4,
        vn4,
        k_all,
        v_all,
    )
    return out.reshape(b, n_heads, hd)


def flash_gqa_attention(q, k, v, q_pos) -> jax.Array:
    """General-shape entry point: delegates to the XLA path (the decode
    model path calls flash_gqa_decode_stacked directly)."""
    from ..attention import gqa_attention_xla

    return gqa_attention_xla(q, k, v, q_pos)


# Below this window size the XLA full-scan attention is cheaper than the
# kernel's per-program fixed costs (measured on v5e: XLA wins up to at least
# 4k — its fused batched matmuls beat the kernel's per-(batch, head) program
# overhead and small [kv_mul, BLK] dots).  The pos-bounded kernel is kept as
# correctness-tested infrastructure for very long windows; restructuring for
# one-program-per-batch with head-batched DMAs is the planned next step.
MIN_SEQ_LEN = 16384


def decode_supported(n_heads: int, n_kv: int, head_dim: int, t: int) -> bool:
    """Kernel constraints: whole-slab DMA blocks need T % BLK_T == 0 and a
    128-lane head_dim; only engaged for long windows (MIN_SEQ_LEN)."""
    return (
        head_dim % 128 == 0
        and t % BLK_T == 0
        and t >= MIN_SEQ_LEN
        and n_heads % n_kv == 0
    )