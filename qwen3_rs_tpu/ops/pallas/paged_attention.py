"""Paged GQA decode attention (Pallas): pages DMA'd pool→VMEM by page id.

TPU-native decode attention over the serving page pool
(serving/paged_cache.py).  The XLA paged path (ops/attention.py
``gqa_attention_split_paged``) gathers each key chunk with ``k_pool[pids]``
— which materializes an f32 copy of every touched page in HBM per layer per
step (gather write + re-read), measured at ~3.4 ms/step of a 15.3 ms b8
decode step on 8B.  This kernel instead reads the **page table from SMEM**
(scalar prefetch) and DMAs each request's pages straight into VMEM,
double-buffered, so touched pages cross HBM exactly once and nothing is
materialized.

Reference semantics: the t ∈ [0, pos) walk of
qwen3-inference/src/layers.rs:374-419 over the cached prefix, plus the
current token's (self) key/value, which seeds the online softmax — output
is exactly ``gqa_attention_split_paged`` at S = 1.

Layout notes:
* pool ``[L, P, n_kv, page, hd]``: one DMA per (request, page) moves the
  contiguous ``[n_kv, page, hd]`` slab — 256 KB at 8B shapes (bf16), a
  bandwidth-friendly burst; all kv heads advance together so the score and
  value contractions are kv-batched ``[kv, mul, hd] × [kv, page, hd]`` dots.
* INT8 pool (QuantizedPagedKVCache): codes halve the DMA bytes; the
  per-(row, head) scales fold into the *scores* (for K) and the softmax
  *probs* (for V), so dequantization never expands to head_dim width.
* grid = (B,): the per-request chunk loop is position-bounded in-kernel
  (``cdiv(pos[b], page)`` iterations) — no grid steps are spent on the
  allocated-but-unused tail of the page table, unlike a (B, max_pages)
  grid.

The layer scan passes the full stacked pool + the layer index as a scalar
(like flash_attention.py), so the scan never slices — and therefore never
copies — the pool.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def paged_flash_enabled() -> bool:
    return os.environ.get("QWEN3_TPU_DISABLE_PAGED_FLASH", "0") != "1"


def paged_decode_supported(head_dim: int, page_size: int, dtype) -> bool:
    """Kernel constraints: 128-lane head_dim and page rows; pool dtype must
    be a native MXU input (bf16/f32) or int8 codes."""
    return (
        head_dim % 128 == 0
        and page_size % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32, jnp.int8)
    )


def _kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    pos_ref,  # [B] int32 — cache rows < pos are valid
    pt_ref,  # [B, max_pages] int32 page table
    # inputs
    q_ref,  # [1, kv, mul, hd] f32 (VMEM block, pre-scaled)
    kn_ref,  # [1, kv, 1, hd] f32 — self key
    vn_ref,  # [1, kv, 1, hd] f32 — self value
    k_pool_ref,  # [L, P, kv, page, hd] (HBM)
    v_pool_ref,  # [L, P, kv, page, hd] (HBM)
    *rest,  # quantized: ks_pool, vs_pool ([L, P, kv, page] f32, HBM); then out
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_pool_ref, vs_pool_ref, out_ref = rest
    else:
        (out_ref,) = rest

    b = pl.program_id(0)
    layer = layer_ref[0]
    p = pos_ref[b]
    page = k_pool_ref.shape[3]

    q = q_ref[0] * scale  # [kv, mul, hd]
    kn = kn_ref[0]  # [kv, 1, hd]
    vn = vn_ref[0]
    n_kv = q.shape[0]

    # Per-head 2D dots (batched dot_general is not lowerable by Mosaic);
    # the kv loop is static, so this unrolls into n_kv MXU dots per chunk.
    def _dot_t(a, b):  # a [m, hd], b [n, hd] → [m, n]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def body(k_buf, v_buf, sem_k, sem_v, ks_buf=None, vs_buf=None, sem_ks=None, sem_vs=None):
        # Online softmax seeded with the self key: m = s_self, denom = 1,
        # acc = v_self (the current token always attends to itself).
        s_self = jnp.stack(
            [_dot_t(q[h], kn[h]) for h in range(n_kv)]
        )  # [kv, mul, 1]
        m0 = s_self
        denom0 = jnp.ones_like(s_self)
        acc0 = jnp.broadcast_to(vn, q.shape).astype(jnp.float32)  # [kv, mul, hd]

        n_chunks = pl.cdiv(p, page)

        def start_dma(j, slot):
            pid = pt_ref[b, j]
            pltpu.make_async_copy(
                k_pool_ref.at[layer, pid], k_buf.at[slot], sem_k.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_pool_ref.at[layer, pid], v_buf.at[slot], sem_v.at[slot]
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[layer, pid], ks_buf.at[slot], sem_ks.at[slot]
                ).start()
                pltpu.make_async_copy(
                    vs_pool_ref.at[layer, pid], vs_buf.at[slot], sem_vs.at[slot]
                ).start()

        def wait_dma(j, slot):
            pid = pt_ref[b, j]
            pltpu.make_async_copy(
                k_pool_ref.at[layer, pid], k_buf.at[slot], sem_k.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_pool_ref.at[layer, pid], v_buf.at[slot], sem_v.at[slot]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[layer, pid], ks_buf.at[slot], sem_ks.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_pool_ref.at[layer, pid], vs_buf.at[slot], sem_vs.at[slot]
                ).wait()

        @pl.when(n_chunks > 0)
        def _():
            start_dma(0, 0)

        def step(j, carry):
            m, denom, acc = carry
            slot = jax.lax.rem(j, 2)

            # Prefetch page j+1 while page j is consumed.
            @pl.when(j + 1 < n_chunks)
            def _():
                start_dma(j + 1, 1 - slot)

            wait_dma(j, slot)

            kf = k_buf[slot].astype(jnp.float32)  # [kv, page, hd]
            vf = v_buf[slot].astype(jnp.float32)
            m_hs, d_hs, a_hs = [], [], []
            for h in range(n_kv):
                sc = _dot_t(q[h], kf[h])  # [mul, page]
                if quantized:
                    sc = sc * ks_buf[slot, h : h + 1, :]
                t_idx = j * page + jax.lax.broadcasted_iota(
                    jnp.int32, sc.shape, 1
                )
                sc = jnp.where(t_idx < p, sc, -jnp.inf)

                m_new = jnp.maximum(m[h], jnp.max(sc, axis=1, keepdims=True))
                corr = jnp.exp(m[h] - m_new)
                probs = jnp.exp(sc - m_new)
                d_new = denom[h] * corr + jnp.sum(probs, axis=1, keepdims=True)
                if quantized:
                    probs = probs * vs_buf[slot, h : h + 1, :]
                a_new = acc[h] * corr + jax.lax.dot_general(
                    probs,
                    vf[h],
                    (((1,), (0,)), ((), ())),  # [mul, page] × [page, hd]
                    preferred_element_type=jnp.float32,
                )
                m_hs.append(m_new)
                d_hs.append(d_new)
                a_hs.append(a_new)
            return jnp.stack(m_hs), jnp.stack(d_hs), jnp.stack(a_hs)

        m, denom, acc = jax.lax.fori_loop(0, n_chunks, step, (m0, denom0, acc0))
        out_ref[0] = acc / denom

    kv, page_sz, hd = k_pool_ref.shape[2], k_pool_ref.shape[3], k_pool_ref.shape[4]
    scratch = dict(
        k_buf=pltpu.VMEM((2, kv, page_sz, hd), k_pool_ref.dtype),
        v_buf=pltpu.VMEM((2, kv, page_sz, hd), v_pool_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )
    if quantized:
        scratch.update(
            ks_buf=pltpu.VMEM((2, kv, page_sz), jnp.float32),
            vs_buf=pltpu.VMEM((2, kv, page_sz), jnp.float32),
            sem_ks=pltpu.SemaphoreType.DMA((2,)),
            sem_vs=pltpu.SemaphoreType.DMA((2,)),
        )
    pl.run_scoped(body, **scratch)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_gqa_decode_stacked(
    q: jax.Array,  # [B, n_heads, hd] f32
    k_new: jax.Array,  # [B, n_kv, hd]
    v_new: jax.Array,  # [B, n_kv, hd]
    k_pool: jax.Array,  # [L, P, n_kv, page, hd]
    v_pool: jax.Array,  # [L, P, n_kv, page, hd]
    page_table: jax.Array,  # [B, max_pages] int32
    pos: jax.Array,  # [B] int32
    layer_idx,  # scalar int32
    *,
    k_scale_pool: jax.Array | None = None,  # [L, P, n_kv, page] f32
    v_scale_pool: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Paged decode attention (prefix pages + self key) → [B, n_heads, hd]."""
    b, n_heads, hd = q.shape
    n_kv = k_pool.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (hd**0.5)
    quantized = k_scale_pool is not None

    q4 = q.reshape(b, n_kv, kv_mul, hd).astype(jnp.float32)
    kn4 = k_new.reshape(b, n_kv, 1, hd).astype(jnp.float32)
    vn4 = v_new.reshape(b, n_kv, 1, hd).astype(jnp.float32)

    bspec = lambda shp: pl.BlockSpec(
        shp, lambda i, l, p, t: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        bspec((1, n_kv, kv_mul, hd)),
        bspec((1, n_kv, 1, hd)),
        bspec((1, n_kv, 1, hd)),
        pl.BlockSpec(memory_space=pl.ANY),  # k_pool stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # v_pool
    ]
    args = [q4, kn4, vn4, k_pool, v_pool]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [k_scale_pool, v_scale_pool]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n_kv, kv_mul, hd),
            lambda i, l, p, t: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, kv_mul, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32),
        jnp.asarray(page_table, jnp.int32),
        *args,
    )
    return out.reshape(b, n_heads, hd)


# ---------------------------------------------------------------------------
# Small-window variant: S query rows per request (speculative verify windows,
# short continuation prefills).  The kernel streams only the CACHE part —
# per-request position-bounded page DMAs, identical to the decode kernel —
# and emits online-softmax partials (m, l, acc); the in-window causal
# attention and the joint normalization run in XLA (ops/attention.py
# ``_merge_window``), which is tiny at these sizes.  All S rows sit at
# positions >= pos[b], so the whole block shares one validity mask.


def _partials_kernel(
    layer_ref,  # [1] int32
    pos_ref,  # [B] int32
    pt_ref,  # [B, max_pages] int32
    q_ref,  # [1, kv, R, hd] f32 (R = S*kv_mul rows, pre-scaled)
    k_pool_ref,  # [L, P, kv, page, hd] (HBM)
    v_pool_ref,
    *rest,  # quantized: ks_pool, vs_pool; then out_m, out_l, out_acc
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_pool_ref, vs_pool_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest

    b = pl.program_id(0)
    layer = layer_ref[0]
    p = pos_ref[b]
    page = k_pool_ref.shape[3]
    n_kv = q_ref.shape[1]

    q = q_ref[0] * scale  # [kv, R, hd]

    def _dot_t(a, bm):  # a [r, hd], bm [n, hd] → [r, n]
        return jax.lax.dot_general(
            a, bm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def body(k_buf, v_buf, sem_k, sem_v, ks_buf=None, vs_buf=None, sem_ks=None, sem_vs=None):
        r = q.shape[1]
        m0 = jnp.full((n_kv, r, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((n_kv, r, 1), jnp.float32)
        acc0 = jnp.zeros((n_kv, r, q.shape[2]), jnp.float32)

        n_chunks = pl.cdiv(p, page)

        def start_dma(j, slot):
            pid = pt_ref[b, j]
            pltpu.make_async_copy(
                k_pool_ref.at[layer, pid], k_buf.at[slot], sem_k.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_pool_ref.at[layer, pid], v_buf.at[slot], sem_v.at[slot]
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[layer, pid], ks_buf.at[slot], sem_ks.at[slot]
                ).start()
                pltpu.make_async_copy(
                    vs_pool_ref.at[layer, pid], vs_buf.at[slot], sem_vs.at[slot]
                ).start()

        def wait_dma(j, slot):
            pid = pt_ref[b, j]
            pltpu.make_async_copy(
                k_pool_ref.at[layer, pid], k_buf.at[slot], sem_k.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_pool_ref.at[layer, pid], v_buf.at[slot], sem_v.at[slot]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[layer, pid], ks_buf.at[slot], sem_ks.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_pool_ref.at[layer, pid], vs_buf.at[slot], sem_vs.at[slot]
                ).wait()

        @pl.when(n_chunks > 0)
        def _():
            start_dma(0, 0)

        def step(j, carry):
            m, l, acc = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_chunks)
            def _():
                start_dma(j + 1, 1 - slot)

            wait_dma(j, slot)

            kf = k_buf[slot].astype(jnp.float32)  # [kv, page, hd]
            vf = v_buf[slot].astype(jnp.float32)
            m_hs, l_hs, a_hs = [], [], []
            for h in range(n_kv):
                sc = _dot_t(q[h], kf[h])  # [R, page]
                if quantized:
                    sc = sc * ks_buf[slot, h : h + 1, :]
                t_idx = j * page + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
                sc = jnp.where(t_idx < p, sc, -jnp.inf)

                m_new = jnp.maximum(m[h], jnp.max(sc, axis=1, keepdims=True))
                finite = jnp.isfinite(m_new)
                corr = jnp.where(finite, jnp.exp(m[h] - m_new), 0.0)
                probs = jnp.where(finite, jnp.exp(sc - m_new), 0.0)
                l_new = l[h] * corr + jnp.sum(probs, axis=1, keepdims=True)
                if quantized:
                    probs = probs * vs_buf[slot, h : h + 1, :]
                a_new = acc[h] * corr + jax.lax.dot_general(
                    probs,
                    vf[h],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_hs.append(m_new)
                l_hs.append(l_new)
                a_hs.append(a_new)
            return jnp.stack(m_hs), jnp.stack(l_hs), jnp.stack(a_hs)

        m, l, acc = jax.lax.fori_loop(0, n_chunks, step, (m0, l0, acc0))
        # m/l broadcast along the 128-lane output axis; the host slices lane 0.
        m_ref[0] = jnp.broadcast_to(m, m_ref.shape[1:])
        l_ref[0] = jnp.broadcast_to(l, l_ref.shape[1:])
        acc_ref[0] = acc

    kv, page_sz, hd = k_pool_ref.shape[2], k_pool_ref.shape[3], k_pool_ref.shape[4]
    scratch = dict(
        k_buf=pltpu.VMEM((2, kv, page_sz, hd), k_pool_ref.dtype),
        v_buf=pltpu.VMEM((2, kv, page_sz, hd), v_pool_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )
    if quantized:
        scratch.update(
            ks_buf=pltpu.VMEM((2, kv, page_sz), jnp.float32),
            vs_buf=pltpu.VMEM((2, kv, page_sz), jnp.float32),
            sem_ks=pltpu.SemaphoreType.DMA((2,)),
            sem_vs=pltpu.SemaphoreType.DMA((2,)),
        )
    pl.run_scoped(body, **scratch)


# VMEM bound for the kernel's per-head loop carries (acc [kv, R, hd] f32 and
# the double-buffered page slabs): R = S*kv_mul rows.
MAX_WINDOW_ROWS = 128


def paged_window_supported(
    head_dim: int, page_size: int, dtype, s: int, kv_mul: int
) -> bool:
    return (
        paged_decode_supported(head_dim, page_size, dtype)
        and s > 1  # S == 1 uses the fused decode kernel
        and s * kv_mul <= MAX_WINDOW_ROWS
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_gqa_window_stacked(
    q: jax.Array,  # [B, S, n_heads, hd]
    k_new: jax.Array,  # [B, S, n_kv, hd]
    v_new: jax.Array,  # [B, S, n_kv, hd]
    k_pool: jax.Array,  # [L, P, n_kv, page, hd]
    v_pool: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    pos: jax.Array,  # [B] int32 — cache rows < pos are valid for every row
    layer_idx,
    *,
    k_scale_pool: jax.Array | None = None,
    v_scale_pool: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Small-window paged attention (cache prefix via the Pallas partials
    kernel + causal in-window attention merged in XLA) → [B, S, heads, hd].

    Query row i sits at absolute position pos[b] + i (the model's spec
    verify / continuation window convention)."""
    from ...ops.attention import _merge_window

    b, s, n_heads, hd = q.shape
    n_kv = k_pool.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (hd**0.5)
    quantized = k_scale_pool is not None
    r = s * kv_mul

    qf = q.reshape(b, s, n_kv, kv_mul, hd).astype(jnp.float32)
    # Kernel row layout: [B, kv, (mul, s) → R, hd] so the partials reshape
    # back to _merge_window's [B, KV, M, S, ...] without a transpose.
    q_rows = jnp.transpose(qf, (0, 2, 3, 1, 4)).reshape(b, n_kv, r, hd)

    bspec = lambda shp: pl.BlockSpec(
        shp, lambda i, l, p, t: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        bspec((1, n_kv, r, hd)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [q_rows, k_pool, v_pool]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [k_scale_pool, v_scale_pool]

    out_specs = [
        bspec((1, n_kv, r, 128)),
        bspec((1, n_kv, r, 128)),
        bspec((1, n_kv, r, hd)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_kv, r, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, n_kv, r, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, n_kv, r, hd), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    m, l, acc = pl.pallas_call(
        functools.partial(_partials_kernel, scale=scale, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32),
        jnp.asarray(page_table, jnp.int32),
        *args,
    )
    # [B, kv, R(=mul*s), …] → [B, KV, M, S, …]
    m_c = m[..., :1].reshape(b, n_kv, kv_mul, s, 1)
    l_c = l[..., :1].reshape(b, n_kv, kv_mul, s, 1)
    acc_c = acc.reshape(b, n_kv, kv_mul, s, hd)
    return _merge_window(
        qf, m_c, l_c, acc_c,
        k_new.astype(jnp.float32), v_new.astype(jnp.float32),
        win_offset=0, scale=scale, out_dtype=q.dtype,
    )
