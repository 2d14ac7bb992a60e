"""Qwen3 model: functional, batched, jit-compiled forward over a device mesh.

TPU-native counterpart of the reference model layer
(qwen3-inference/src/models/qwen3.rs).  Where the reference runs a scalar
token-at-a-time loop over per-layer Rust structs, this implementation is a
pure function over pytrees:

* all per-layer weights are stacked on a leading ``[n_layers, ...]`` axis and
  the layer loop is a ``lax.scan`` — one compiled block regardless of depth;
* the same step function serves prefill (``S > 1``) and decode (``S = 1``)
  with batched tokens ``[B, S]`` — the reference has no batching or
  prefill/decode distinction at all (generation.rs:26-29);
* the KV cache is a preallocated static-shape pytree carried through the
  scan, updated with dynamic slices at per-request positions.

Math parity notes (vs qwen3-inference/src/models/qwen3.rs:131-176 and
layers.rs): RMSNorm ε from config (reference hardcodes 1e-6, layers.rs:6);
RoPE theta 1e6 (layers.rs:9) via precomputed tables; QK-RMSNorm per head
before RoPE (layers.rs:346-372); GQA attention scaled by 1/√head_dim;
SwiGLU FFN (layers.rs:466-480).  In ``exact`` mode activations are
group-quantized to INT8 before every projection exactly as the reference
does (W8A8); in ``fast`` mode activations stay bf16/f32 against INT8
weights (W8A16) — same weight bytes from HBM, strictly lower quantization
error, and the path Pallas kernels accelerate.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..configuration import ModelConfig
from ..ops.attention import gqa_attention_split
from ..ops.matmul import qmatmul, qmatmul_exact
from ..ops.norms import rms_norm
from ..ops.quant import Q4Tensor, QuantizedTensor, dequantize, quantize_activations
from ..ops.rope import apply_rope, rope_table


class Qwen3LayerWeights(NamedTuple):
    """Per-layer weights, each stacked on a leading [n_layers] axis.

    Linear weights use the **in-major (transposed) compute layout**:
    codes ``[L, in, out]`` with scales ``[L, in/g, out]`` — see
    ops/matmul.py.  The checkpoint loaders transpose from the on-disk
    row-major layout once at load time.
    """

    rms_att: jax.Array  # [L, dim] f32
    rms_ffn: jax.Array  # [L, dim] f32
    q_norm: jax.Array  # [L, head_dim] f32
    k_norm: jax.Array  # [L, head_dim] f32
    # Projections sharing an input are fused along the out axis — one kernel
    # streams one contiguous weight block instead of three/two (the out
    # columns are independent, so results are bit-identical to separate
    # matmuls; the loaders concatenate at load time).
    wqkv: QuantizedTensor  # [L, dim, all_heads_dim + 2·kv_dim]  (q | k | v)
    wo: QuantizedTensor  # [L, all_heads_dim, dim]
    w13: QuantizedTensor  # [L, dim, 2·hidden_dim]  (gate | up)
    w2: QuantizedTensor  # [L, hidden_dim, dim]   (down)


class Qwen3Weights(NamedTuple):
    embed: QuantizedTensor  # [vocab, dim] row-major — kept quantized; rows
    # are gathered and dequantized per token instead of materializing the
    # f32 table up front as the reference does (models/qwen3.rs:240-242).
    layers: Qwen3LayerWeights
    rms_final: jax.Array  # [dim] f32
    lm_head: QuantizedTensor  # [dim, vocab_padded] in-major; a transposed
    # copy of the embedding when the classifier is shared
    # (models/qwen3.rs:252-259).  The out axis may be zero-padded to a tile
    # multiple — qwen3_forward slices logits back to vocab_size.


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, n_kv_heads, T, head_dim]
    v: jax.Array  # [L, B, n_kv_heads, T, head_dim]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]


class QuantizedKVCache(NamedTuple):
    """Dense INT8 KV cache: codes + one symmetric scale per row per head.

    Halves cache HBM traffic — the dominant stream for long-context decode
    (at 16k the KV read is ~2.2 GB/token vs ~8.9 GB of weights at 8B).
    Rows quantize at write time; attention dequantizes each position-bounded
    key chunk as it is read (ops/attention.py)."""

    k: jax.Array  # int8 [L, B, n_kv_heads, T, head_dim]
    v: jax.Array  # int8 [L, B, n_kv_heads, T, head_dim]
    k_scale: jax.Array  # f32 [L, B, n_kv_heads, T]
    v_scale: jax.Array  # f32 [L, B, n_kv_heads, T]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]


def cast_weight_scales(weights: Qwen3Weights, dtype=jnp.bfloat16) -> Qwen3Weights:
    """Cast the linear-layer weight scales to ``dtype`` for the fast path.

    The Pallas matmul kernel converts scales to bf16 in VMEM anyway
    (ops/pallas/qmatmul.py), so storing them as bf16 is numerically
    identical there while cutting the streamed scale bytes in half —
    f32 scales at group size 64 are 6.25% of decode HBM traffic.
    Embedding scales stay f32: they are gathered per token (negligible
    traffic) and feed the residual stream directly.
    """

    def cast_qt(qt):
        return type(qt)(qt.q, qt.scales.astype(dtype))

    lw = weights.layers
    return weights._replace(
        layers=lw._replace(
            wqkv=cast_qt(lw.wqkv),
            wo=cast_qt(lw.wo),
            w13=cast_qt(lw.w13),
            w2=cast_qt(lw.w2),
        ),
        lm_head=cast_qt(weights.lm_head),
    )


def init_kv_cache(
    config: ModelConfig, batch: int, dtype=jnp.float32, seq_len: Optional[int] = None
) -> KVCache | QuantizedKVCache:
    """Preallocate the dense KV cache (reference: models/qwen3.rs:439-440,
    but batched and head-major: each head's [T, head_dim] slab is contiguous
    so attention reads stream in long bursts).  ``dtype="int8"`` builds the
    quantized cache (QuantizedKVCache)."""
    t = seq_len or config.seq_len
    shape = (config.n_layers, batch, config.n_kv_heads, t, config.head_dim)
    if dtype == "int8" or dtype == jnp.int8:
        return QuantizedKVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:-1], jnp.float32),
            jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _project(x, xq, w, mode: str):
    """Dispatch one quantized projection according to engine mode.

    Modes: ``fast`` (W8A16, Pallas), ``exact`` (reference-parity W8A8),
    ``f32`` (dequantized weights, full-f32 matmul — the "fp32 reference"
    side of the perplexity-delta accuracy bar).
    """
    if isinstance(w, Q4Tensor):
        # INT4 is a TPU-first extension (no reference W8A8 counterpart):
        # fast mode runs the Pallas unpack+dequant kernels (via
        # _project_layer) or this XLA dense fallback; f32 mode dequantizes
        # for the accuracy-bar comparison.
        if mode == "exact":
            raise ValueError("INT4 weights have no reference-exact (W8A8) mode")
        from ..ops.quant import dequantize_q4_inmajor

        dtype = jnp.float32 if mode == "f32" else jnp.bfloat16
        wf = dequantize_q4_inmajor(w, dtype)
        return jax.lax.dot_general(
            x.astype(dtype),
            wf,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if mode == "f32" else None,
        )
    if mode == "exact":
        return qmatmul_exact(xq, w)
    if mode == "f32":
        from ..ops.matmul import dequant_weights

        wf = dequant_weights(w, jnp.float32)
        return jax.lax.dot_general(
            x.astype(jnp.float32),
            wf,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return qmatmul(x, w)


def _slice_layer(w_all, idx):
    """Slice layer ``idx`` from stacked weights, preserving the tensor kind
    (QuantizedTensor or Q4Tensor — both (codes, scales) NamedTuples)."""
    return type(w_all)(
        jax.lax.dynamic_index_in_dim(w_all.q, idx, 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(w_all.scales, idx, 0, keepdims=False),
    )


def _project_layer(x, xq, w_all: QuantizedTensor, idx, mode: str):
    """One projection against layer ``idx`` of stacked weights [L, N, D].

    In fast mode on TPU the Pallas kernel indexes the stacked array itself
    (scalar prefetch) so no per-layer weight copy is ever materialized; other
    paths slice explicitly."""
    if mode == "fast":
        import os

        from ..ops import pallas as pallas_ops
        from ..ops.pallas.qmatmul import (
            rows_a8_supported,
            rows_supported,
            supports_shapes,
        )

        _, n, d = w_all.q.shape
        q4 = isinstance(w_all, Q4Tensor)
        if q4:
            n *= 2  # codes are nibble-packed on the in axis
        group_size = n // w_all.scales.shape[1]
        batch_rows = 1
        for dim in x.shape[:-1]:
            batch_rows *= dim
        if pallas_ops.pallas_enabled():
            # Decode / small prefill buckets: whole [rows, tile] activation
            # and output blocks live in VMEM.
            if batch_rows <= 256 and supports_shapes(n, d, group_size, q4=q4):
                return pallas_ops.qmatmul_pallas_stacked(x, w_all, idx)
            if batch_rows > 256:
                # Long prefill.  The W8A8 int8-MXU rows kernel quantizes
                # activations on the fly (int8×int8→int32 MXU dots, scale
                # fixup in the f32 epilogue — reference semantics
                # tensor.rs:45-61 at MXU speed).  The committed A/B
                # (scripts/prefill_a8_ab.py; table in docs/kernels.md)
                # found NO win region — W8A16 won all measured combinations
                # — so "auto" currently always selects the W8A16 rows
                # kernel and only the env override engages A8:
                # QWEN3_TPU_PREFILL_A8=1 forces it on, =0 forces it off
                # (bounded extra quant error vs W8A16).
                if (
                    not q4
                    and _a8_prefill_wins(batch_rows, os.environ.get("QWEN3_TPU_PREFILL_A8", "auto"))
                    and rows_a8_supported(n, d, group_size, batch_rows)
                ):
                    from ..ops.pallas.qmatmul import qmatmul_pallas_stacked_rows_a8

                    return qmatmul_pallas_stacked_rows_a8(x, w_all, idx)
                # XLA-dot path: one streaming dequant pass (Pallas, HBM
                # rate) then XLA's native bf16 matmul — at long-prefill row
                # counts XLA's dot emitters sustain ~180-200 TF/s where the
                # rows kernel reaches ~140-165 (scripts/xla_dot_probe.py),
                # and the dequant pass amortizes over the rows.  Auto
                # engages above the measured crossover; QWEN3_TPU_PREFILL_XDOT
                # =1/0 forces it on/off for A/Bs.
                from ..ops.pallas.qmatmul import dequant_supported

                if (
                    _xdot_prefill_wins(
                        batch_rows, n, d,
                        os.environ.get("QWEN3_TPU_PREFILL_XDOT", "auto"),
                    )
                    and dequant_supported(n, d, group_size, q4=q4)
                ):
                    from ..ops.pallas.qmatmul import dequant_pallas_stacked

                    wbf = dequant_pallas_stacked(w_all, idx)
                    out = jnp.dot(
                        x.reshape(-1, n).astype(jnp.bfloat16),
                        wbf,
                        preferred_element_type=jnp.float32,
                    )
                    return out.reshape(*x.shape[:-1], d)
                # Row-blocked kernel — dequantizes in VMEM, saving the XLA
                # dense path's dequant round-trips (~2.1 GB/layer on 8B).
                if rows_supported(n, d, group_size, batch_rows, q4=q4):
                    return pallas_ops.qmatmul_pallas_stacked_rows(x, w_all, idx)
    return _project(x, xq, _slice_layer(w_all, idx), mode)


# Measured crossover for on-the-fly activation quantization at prefill
# (scripts/prefill_a8_ab.py, v5e, 8B matrices; full table in
# docs/kernels.md): pending calibration — until the committed A/B shows a
# win region, "auto" keeps the proven W8A16 rows kernel.
_A8_PREFILL_MIN_ROWS: int | None = None  # None = A8 never wins / uncalibrated


# Measured crossover for the dequant-then-XLA-dot prefill path
# (scripts/xla_dot_probe.py isolated; calibrated END-TO-END with
# BENCH_MODE=prefill interleaved A/Bs, 8B, 2026-08 — full table in
# docs/kernels.md).  The win region is narrow: ONLY the large
# down-projection (w2, n>d) at long prefills —
#   s=4096 w2-only: +3.6-5.4% (0.693 -> 0.719-0.734 of MXU peak)
#   s=4096 all-projections: -4.5%;  w13+w2: -5% vs w2-only
#   s=2048 w2-only: wash;  s=1024 w2-only: -2-4%;  0.6B s=1024: -22%
# (everywhere else the dequant temp's extra HBM round-trip costs more
# than XLA's dot-emitter advantage buys).  QWEN3_TPU_PREFILL_XDOT
# overrides for A/Bs: 1 = all projections, w2 = n>d shapes, big = FFN
# shapes, 0 = off; auto = the measured region below.
_XDOT_PREFILL_MIN_ROWS: int | None = 4096
# Model sweep at s=4096: 8B w2 (50.3M) +3.6-5.4%, 4B w2 (24.9M)
# +3.3/+15% (adjacent bench pairs), 1.7B w2 (12.6M) **+5.0% interleaved**
# (scripts/prefill_ab.py, r5 — the r4 "wash" was drift; the gate's 1.7B
# admission is now justified by a same-process row), 0.6B w2 (3.1M) LOSS
# — the gate admits every measured win and excludes 0.6B.
_XDOT_MIN_WEIGHT_ELEMS = 10_000_000


def _xdot_prefill_wins(rows: int, n: int, d: int, env: str) -> bool:
    """Whether the dequant+XLA-dot path should take this projection."""
    if env == "1":
        return True
    if env == "w2":
        return n > d
    if env == "big":  # the two FFN matmuls (w13 + w2), not qkv/attn_out
        return n * d >= _XDOT_MIN_WEIGHT_ELEMS
    if env == "0" or _XDOT_PREFILL_MIN_ROWS is None:
        return False
    return (
        rows >= _XDOT_PREFILL_MIN_ROWS
        and n > d
        and n * d >= _XDOT_MIN_WEIGHT_ELEMS
    )


def _a8_prefill_wins(rows: int, env: str) -> bool:
    """Whether the W8A8 rows kernel should take this projection."""
    if env == "1":
        return True
    if env == "0" or _A8_PREFILL_MIN_ROWS is None:
        return False
    return rows >= _A8_PREFILL_MIN_ROWS


def _maybe_quant(x, group_size: int, mode: str):
    if mode == "exact":
        return quantize_activations(x, group_size)
    return None


def _tp_overlap_chunks(rows: int, d_out: int) -> int:
    """Column chunks for row-parallel projections under tensor parallelism.

    Splitting the projection's out axis into chunks and psumming each chunk
    as soon as it is computed lets XLA's async all-reduce overlap chunk i's
    ICI transfer with chunk i+1's matmul (collective matmul — the SURVEY
    §2.4 TP requirement).  Only worth it when the psum payload is large:
    decode-sized psums ([B≤256, dim] ≲ 4 MB) are latency-bound and chunking
    would just add kernel boundaries, so overlap engages at prefill row
    counts.  Tunables for A/B: QWEN3_TPU_TP_OVERLAP_CHUNKS (0/1 disables),
    QWEN3_TPU_TP_OVERLAP_MIN_ROWS."""
    import os

    c = int(os.environ.get("QWEN3_TPU_TP_OVERLAP_CHUNKS", "4"))
    min_rows = int(os.environ.get("QWEN3_TPU_TP_OVERLAP_MIN_ROWS", "512"))
    if c <= 1 or rows < min_rows:
        return 1
    while c > 1 and d_out % (c * 128):
        c //= 2
    return c


def _project_layer_cols(x, xq, w_all, idx, mode: str, c0: int, dc: int):
    """One projection against out columns [c0, c0+dc) of stacked weights.

    The Pallas rows kernel takes the slice as an index-map offset (no
    weight copy in HBM); other paths slice the (codes, scales) pair — an
    explicit copy, acceptable on the XLA fallback which materializes a
    dequantized matrix anyway."""
    if mode == "fast" and not isinstance(w_all, Q4Tensor):
        from ..ops import pallas as pallas_ops
        from ..ops.pallas.qmatmul import rows_supported

        _, n, _ = w_all.q.shape
        group_size = n // w_all.scales.shape[1]
        batch_rows = 1
        for dim in x.shape[:-1]:
            batch_rows *= dim
        if (
            pallas_ops.pallas_enabled()
            and batch_rows > 256
            and rows_supported(n, dc, group_size, batch_rows)
        ):
            from ..ops.pallas.qmatmul import qmatmul_pallas_stacked_rows

            return qmatmul_pallas_stacked_rows(x, w_all, idx, out_cols=(c0, dc))
    w_sl = type(w_all)(
        jax.lax.slice_in_dim(w_all.q, c0, c0 + dc, axis=-1),
        jax.lax.slice_in_dim(w_all.scales, c0, c0 + dc, axis=-1),
    )
    return _project(x, xq, _slice_layer(w_sl, idx), mode)


def _scatter_dense(cache_full, new_rows, pos_start, write_mask):
    """Scatter window K/V rows ([L, B, S, kv, hd]) into the dense cache
    ([L, B, kv, T, hd]) at per-request offsets."""

    def upd_b(cache_lb, new_lb, p):  # [kv,T,hd], [kv,S,hd]
        return jax.lax.dynamic_update_slice(
            cache_lb, new_lb.astype(cache_lb.dtype), (0, p, 0)
        )

    def upd_l(cache_l, new_l):  # [B,kv,T,hd], [B,S,kv,hd]
        new_l = jnp.swapaxes(new_l, 1, 2)  # → [B,kv,S,hd]
        updated = jax.vmap(upd_b)(cache_l, new_l, pos_start)
        if write_mask is None:
            return updated
        return jnp.where(write_mask[:, None, None, None], updated, cache_l)

    return jax.vmap(upd_l)(cache_full, new_rows)


def _head(
    config, weights, x, new_cache, mode, g,
    return_all_logits, out_idx, skip_head, tp_axis,
):
    """Final norm + classifier (models/qwen3.rs:72-76), shared by the
    scan path and the megakernel path."""
    if skip_head:
        return x, new_cache
    if not return_all_logits:
        if out_idx is None:
            x = x[:, -1:, :]
        else:
            x = jnp.take_along_axis(x, out_idx[:, None, None].astype(jnp.int32), axis=1)
    xn = rms_norm(x, weights.rms_final, config.norm_eps)
    xq = _maybe_quant(xn, g, mode)
    logits = _project(xn, xq, weights.lm_head, mode).astype(jnp.float32)
    if tp_axis is None:
        logits = logits[..., : config.vocab_size]
    if not return_all_logits:
        logits = logits[:, 0, :]
    return logits, new_cache


def qwen3_forward(
    config: ModelConfig,
    weights: Qwen3Weights,
    tokens: jax.Array,  # [B, S] int32
    cache: KVCache,
    pos_start: jax.Array,  # [B] int32 — first absolute position of `tokens`
    *,
    mode: str = "fast",
    return_all_logits: bool = False,
    out_idx: jax.Array | None = None,  # [B] int32 — which row's logits to return
    write_mask: jax.Array | None = None,  # [B] bool — per-request cache-write gate
    page_table: jax.Array | None = None,  # [B, max_pages] int32 — paged-cache mode
    fresh_prefill: bool = False,  # static: caller guarantees pos_start == 0
    skip_head: bool = False,  # static: return the residual stream, not logits
    greedy_head: bool = False,  # static: return argmax TOKENS [B] int32 in
    # place of logits — the megakernel fuses the argmax into the classifier
    # phase (no 152k-logit materialization or XLA argmax in the decode
    # scan); every other path computes logits and reduces them here, so
    # callers get identical tokens regardless of which path engaged.
    sp_mesh=None,  # static Mesh: fresh prefills whose window divides the sp
    # axis run ring attention (parallel/context.py) — sequence parallelism
    # for prompts that outgrow one chip's score memory.
    tp_axis: str | None = None,  # static: running inside shard_map over this
    # mesh axis — weights/cache are LOCAL shards (config must be the local
    # config, parallel/tp.py), the embedding gather masks + psums, and the
    # row-parallel projections (wo, w2) psum before the residual add.
    # Returned logits are the local lm_head columns (caller reassembles).
) -> tuple[jax.Array, KVCache]:
    """One model step (prefill when S>1, decode when S==1).

    Returns (logits, cache): logits [B, vocab] for the row selected by
    ``out_idx`` (default: the last row, S-1), or [B, S, vocab] when
    ``return_all_logits``.  ``out_idx`` exists because prefill windows are
    bucket-padded on the right: the caller selects the last *real* prompt
    row.  Padded rows are harmless — their K/V cache slots sit beyond the
    current position and are overwritten by later decode steps before any
    query can attend to them.

    When ``page_table`` is given, ``cache`` is a paged page pool
    (serving/paged_cache.py: k/v ``[L, P, n_kv, page, hd]``); attention
    gathers cache chunks by page id and the step's K/V rows are scattered
    into each request's pages.

    ``fresh_prefill`` is a **static** promise that every ``pos_start[b]``
    is 0 (no cache prefix to attend over); it routes attention to the
    splash prefill kernel (ops/pallas/prefill_attention.py) on supported
    shapes.  Passing it with a nonzero position silently drops the prefix.

    Mirrors the reference forward pass (models/qwen3.rs:62-79, 131-176) over
    a batch and a token window instead of a single (token, pos).
    """
    b, s = tokens.shape
    compute_dtype = jnp.float32 if mode == "exact" else jnp.bfloat16
    g = config.group_size
    paged = page_table is not None
    if greedy_head and (skip_head or tp_axis is not None):
        # skip_head has no logits to reduce; under tp the logits are LOCAL
        # vocab columns — a per-shard argmax would return local ids.
        raise ValueError("greedy_head requires the full head (no skip_head/tp_axis)")

    # Token embedding: gather quantized rows + dequantize (exact same values
    # as the reference's up-front dequantized table, layers.rs:72-76).
    if tp_axis is None:
        emb_q = weights.embed.q[tokens]  # [B, S, dim] int32
        emb_s = weights.embed.scales[tokens]  # [B, S, dim//g]
        x = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32).astype(compute_dtype)
    else:
        # Vocab rows are sharded over tp: gather from the local shard with
        # out-of-range ids masked to zero, then psum the one hot shard's rows.
        v_local = weights.embed.q.shape[0]
        shard = jax.lax.axis_index(tp_axis)
        lid = tokens - shard * v_local
        ok = (lid >= 0) & (lid < v_local)
        lid = jnp.clip(lid, 0, v_local - 1)
        emb_q = weights.embed.q[lid]
        emb_s = weights.embed.scales[lid]
        x = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)
        x = jax.lax.psum(x * ok[..., None], tp_axis).astype(compute_dtype)

    # Absolute positions and RoPE tables for this window.
    q_pos = pos_start[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]  # [B, S]
    rope_len = config.seq_len if paged else cache.seq_len
    cos_t, sin_t = rope_table(rope_len, config.head_dim, config.rope_theta)
    cos = cos_t[q_pos][:, :, None, :]  # [B, S, 1, hd/2]
    sin = sin_t[q_pos][:, :, None, :]

    lw_all = weights.layers

    from ..ops import pallas as pallas_ops
    from ..ops.pallas.flash_attention import decode_supported
    from ..ops.pallas.megakernel import megakernel_supported

    # Whole-stack decode megakernel: the entire layer loop in ONE
    # pallas_call (grid over layers, residual stream in VMEM scratch,
    # weight DMAs never idle across phase/layer boundaries).  Engages for
    # the dense-cache decode step (single-stream OR batched slots, bf16/f32
    # OR INT8 cache); every other shape keeps the per-matrix kernels below.
    # See ops/pallas/megakernel.py.
    use_megakernel = (
        not paged
        and mode == "fast"
        and s == 1
        and tp_axis is None
        and pallas_ops.pallas_enabled()
        and megakernel_supported(
            config,
            cache.seq_len,
            cache.k.dtype,
            b,
            q4=isinstance(lw_all.wqkv, Q4Tensor),
        )
    )
    if use_megakernel:
        from ..ops.pallas.megakernel import (
            decode_stack_megakernel,
            head_phase_supported,
            megakernel_tuning,
        )

        # Ungated callers (no write_mask) must never pass a position at or
        # past the cache window — the kernel writes the step's K/V row at
        # ``pos`` in place.  Refuse loudly when the position is host-visible
        # (tests, direct API use); traced positions (decode scans) are
        # covered by the kernel's in-SMEM clamp (megakernel.py pos_b/pos_w).
        if write_mask is None and not isinstance(pos_start, jax.core.Tracer):
            _pmax = int(jnp.max(pos_start))
            if _pmax >= cache.seq_len:
                raise ValueError(
                    f"megakernel decode: position {_pmax} >= cache window "
                    f"{cache.seq_len}; the ungated path writes K/V rows at "
                    f"pos in place and has no room (callers must validate "
                    f"window room first — see inference/engine.py)"
                )

        # Fuse final norm + classifier as the kernel's last phase when the
        # head shape tiles cleanly: lm_head tiles stream right behind the
        # last w2 tiles with no pallas_call boundary before the logits.
        _tuning = megakernel_tuning()
        fuse_head = (
            not skip_head
            and not isinstance(weights.lm_head, Q4Tensor)
            and head_phase_supported(
                config, weights.lm_head.q.shape[-1], head_tile_bytes=_tuning[3]
            )
        )
        _greedy_fused = greedy_head and fuse_head and not return_all_logits
        x_out, cache_out, head_out = decode_stack_megakernel(
            config,
            x[:, 0, :],
            lw_all.rms_att,
            lw_all.rms_ffn,
            lw_all.q_norm,
            lw_all.k_norm,
            cos[:, 0, 0, :],
            sin[:, 0, 0, :],
            lw_all.wqkv,
            lw_all.wo,
            lw_all.w13,
            lw_all.w2,
            cache.k,
            cache.v,
            pos_start,
            weights.rms_final if fuse_head else None,
            weights.lm_head if fuse_head else None,
            write_mask,
            k_scale=getattr(cache, "k_scale", None),
            v_scale=getattr(cache, "v_scale", None),
            eps=config.norm_eps,
            # Tuning knobs read HERE (per outer trace) and passed as a
            # static: env reads inside the jitted kernel builder freeze
            # at its first trace (inner-jit jaxpr cache), which made
            # same-process env-toggled A/Bs compare a kernel to itself.
            tuning=_tuning,
            greedy=_greedy_fused,
        )
        x = x_out[:, None, :]
        # The kernel wrote the step's K/V rows into the cache in place
        # (input_output_aliases) — no XLA scatter, which would copy the
        # whole cache each step under a loop-varying position.  INT8
        # caches quantize the rows in-kernel and update scales the same
        # way.
        if hasattr(cache, "k_scale"):
            new_cache = cache._replace(
                k=cache_out[0], v=cache_out[1],
                k_scale=cache_out[2], v_scale=cache_out[3],
            )
        else:
            new_cache = cache._replace(k=cache_out[0], v=cache_out[1])
        if fuse_head:
            if _greedy_fused:
                return head_out, new_cache  # argmax tokens [B] int32
            logits = head_out[..., : config.vocab_size]
            if greedy_head:  # return_all_logits path never takes this
                return (
                    jnp.argmax(logits, axis=-1).astype(jnp.int32),
                    new_cache,
                )
            if return_all_logits:
                logits = logits[:, None, :]
            return logits, new_cache
        logits, new_cache = _head(
            config, weights, x, new_cache, mode, g,
            return_all_logits, out_idx, skip_head, tp_axis,
        )
        if greedy_head:
            logits = jnp.argmax(
                logits[..., : config.vocab_size], axis=-1
            ).astype(jnp.int32)
        return logits, new_cache

    use_flash_decode = (
        not paged
        and mode == "fast"
        and s == 1
        and pallas_ops.pallas_enabled()
        and decode_supported(
            config.n_heads, config.n_kv_heads, config.head_dim, cache.seq_len
        )
    )

    from ..ops.pallas.paged_attention import (
        paged_decode_supported,
        paged_flash_enabled,
        paged_window_supported,
    )

    # Paged decode kernel: pages DMA'd pool→VMEM by page id (no gather
    # materialization, no per-layer pool slices) — see ops/pallas/
    # paged_attention.py.  Unlike the dense flash kernel it wins at ordinary
    # window sizes because the XLA alternative pays the gather round-trip.
    # Under tensor parallelism the caller must run this forward INSIDE
    # shard_map (tp_axis=..., parallel/tp.py) so the kernel sees the local
    # pool shard — a plain pallas_call has no GSPMD partitioning spec and
    # auto-partitioning would replicate the whole pool per layer.
    use_paged_flash = (
        paged
        and mode == "fast"
        and s == 1
        and pallas_ops.pallas_enabled()
        and paged_flash_enabled()
        and paged_decode_supported(
            config.head_dim, cache.k.shape[3], cache.k.dtype
        )
    )

    # Fused-glue projections (decode / small windows): RMSNorm, SwiGLU and
    # the residual adds ride the qmatmul kernels instead of standing XLA ops
    # between pallas_call boundaries — see ops/pallas/qmatmul.py (fused).
    from ..ops.pallas.qmatmul import fused_enabled, supports_shapes as _qm_supports

    def _sup(w, n, d):
        return _qm_supports(n, d, g, q4=isinstance(w, Q4Tensor))

    use_fused_glue = (
        mode == "fast"
        and pallas_ops.pallas_enabled()
        and fused_enabled()
        and b * s <= 256
        and _sup(lw_all.wqkv, config.dim, config.all_heads_dim + 2 * config.kv_dim)
        and _sup(lw_all.wo, config.all_heads_dim, config.dim)
        and _sup(lw_all.w13, config.dim, 2 * config.hidden_dim)
        and _sup(lw_all.w2, config.hidden_dim, config.dim)
    )

    from ..ops.pallas.prefill_attention import splash_prefill_supported

    # Sequence-parallel fresh prefill: ring attention over the sp mesh
    # (each shard holds S/N rows; K/V blocks rotate via ppermute).
    use_ring_prefill = (
        fresh_prefill
        and sp_mesh is not None
        and s > 1
        and s % sp_mesh.shape.get("sp", 1) == 0
        and sp_mesh.shape.get("sp", 1) > 1
    )

    use_splash_prefill = (
        not use_ring_prefill
        and fresh_prefill
        and mode == "fast"
        and s > 1
        and pallas_ops.pallas_enabled()
        and splash_prefill_supported(
            s, config.head_dim, config.n_heads, config.n_kv_heads
        )
    )

    # Small multi-row windows (speculative verify, short continuation
    # prefills): same page-DMA kernel shape, emitting online-softmax
    # partials that merge with the in-window causal attention in XLA.
    use_paged_flash_window = (
        paged
        and not use_splash_prefill
        and mode == "fast"
        and s > 1
        and pallas_ops.pallas_enabled()
        and paged_flash_enabled()
        and paged_window_supported(
            config.head_dim,
            cache.k.shape[3],
            cache.k.dtype,
            s,
            config.n_heads // config.n_kv_heads,
        )
    )

    def layer_step(x, scanned):
        idx, rms_att_l, rms_ffn_l, q_norm_l, k_norm_l, cache_layer = scanned
        k_layer, v_layer = cache_layer.k, cache_layer.v

        # --- Attention block (models/qwen3.rs:131-156) ---
        if use_fused_glue:
            qkv = pallas_ops.qmatmul_pallas_stacked_fused(
                x, lw_all.wqkv, idx, norm_w=lw_all.rms_att, eps=config.norm_eps
            )
        else:
            xn = rms_norm(x, rms_att_l, config.norm_eps)
            xq = _maybe_quant(xn, g, mode)
            qkv = _project_layer(xn, xq, lw_all.wqkv, idx, mode)
        ah, kvd = config.all_heads_dim, config.kv_dim
        q = qkv[..., :ah].reshape(b, s, config.n_heads, config.head_dim)
        k = qkv[..., ah : ah + kvd].reshape(b, s, config.n_kv_heads, config.head_dim)
        v = qkv[..., ah + kvd :].reshape(b, s, config.n_kv_heads, config.head_dim)

        # Per-head QK-RMSNorm then RoPE (layers.rs:346-372).  Llama-family
        # models have no QK-norm (config.use_qk_norm=False).
        if config.use_qk_norm:
            q = rms_norm(q, q_norm_l, config.norm_eps)
            k = rms_norm(k, k_norm_l, config.norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # Attention over cached prefix + in-window K/V.  The cache is only
        # *read* here; the new rows are emitted from the scan and scattered
        # into the cache once afterwards — avoiding a full-cache restack per
        # layer per step.
        if use_ring_prefill:
            from ..parallel.context import ring_prefill_attention_inner

            att = ring_prefill_attention_inner(
                q.astype(compute_dtype),
                k.astype(compute_dtype),
                v.astype(compute_dtype),
                sp_mesh,
            )
        elif use_splash_prefill:
            from ..ops.pallas.prefill_attention import causal_prefill_attention

            # Fresh prefill (pos 0): pure causal window attention, score
            # tiles VMEM-resident, masked key blocks skipped in-kernel.
            # Valid for the paged cache too — a fresh prefill reads no
            # prefix, and the page scatter below is attention-independent.
            att = causal_prefill_attention(
                q.astype(compute_dtype),
                k.astype(compute_dtype),
                v.astype(compute_dtype),
            )
        elif use_paged_flash:
            from ..ops.pallas.paged_attention import paged_gqa_decode_stacked

            # Decode (S=1) over the page pool: the kernel reads the page
            # table from SMEM and streams only ceil(pos[b]/page) pages per
            # request; the stacked pool is indexed by layer in-kernel, so
            # the layer scan neither slices nor gathers the pool.
            att = paged_gqa_decode_stacked(
                q[:, 0].astype(jnp.float32),
                k[:, 0].astype(jnp.float32),
                v[:, 0].astype(jnp.float32),
                cache.k,
                cache.v,
                page_table,
                pos_start,
                idx,
                k_scale_pool=getattr(cache, "k_scale", None),
                v_scale_pool=getattr(cache, "v_scale", None),
            )[:, None].astype(compute_dtype)
        elif use_paged_flash_window:
            from ..ops.pallas.paged_attention import paged_gqa_window_stacked

            att = paged_gqa_window_stacked(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                v.astype(jnp.float32),
                cache.k,
                cache.v,
                page_table,
                pos_start,
                idx,
                k_scale_pool=getattr(cache, "k_scale", None),
                v_scale_pool=getattr(cache, "v_scale", None),
            ).astype(compute_dtype)
        elif paged:
            from ..ops.attention import gqa_attention_split_paged

            att = gqa_attention_split_paged(
                q.astype(compute_dtype),
                k_layer,
                v_layer,
                page_table,
                k.astype(compute_dtype),
                v.astype(compute_dtype),
                pos_start,
                k_scale_pool=getattr(cache_layer, "k_scale", None),
                v_scale_pool=getattr(cache_layer, "v_scale", None),
            )
        elif use_flash_decode:
            from ..ops.pallas.flash_attention import flash_gqa_decode_stacked

            # Decode (S=1): the Pallas kernel reads only pos[b] cache rows
            # per head (the XLA path scans in fixed chunks) and indexes the
            # stacked cache by layer — no slice copies.  INT8 caches pass
            # per-row scales; codes dequantize in the score/prob epilogues.
            att = flash_gqa_decode_stacked(
                q[:, 0].astype(jnp.float32),
                k[:, 0].astype(jnp.float32),
                v[:, 0].astype(jnp.float32),
                cache.k,
                cache.v,
                pos_start,
                idx,
                k_scale_all=getattr(cache, "k_scale", None),
                v_scale_all=getattr(cache, "v_scale", None),
            )[:, None]
        else:
            att = gqa_attention_split(
                q.astype(compute_dtype),
                k_layer,
                v_layer,
                k.astype(compute_dtype),
                v.astype(compute_dtype),
                q_pos,
                pos_start,
                k_scale_cache=getattr(cache_layer, "k_scale", None),
                v_scale_cache=getattr(cache_layer, "v_scale", None),
            )
        att = att.reshape(b, s, config.all_heads_dim)

        # Row-parallel projections produce per-shard partial sums under tp:
        # reduce across the axis before the residual add.
        def _rowsum(y):
            return y if tp_axis is None else jax.lax.psum(y, tp_axis)

        def _row_parallel(src, src_q, w_all):
            """Row-parallel projection + reduction, with collective-matmul
            overlap at prefill widths: the out axis splits into chunks and
            each chunk's psum is issued as soon as its matmul finishes, so
            the ICI all-reduce of chunk i hides behind chunk i+1's compute
            (chunks are independent — XLA's async collectives interleave
            them)."""
            if tp_axis is None:
                return _project_layer(src, src_q, w_all, idx, mode)
            d_out = w_all.q.shape[-1]
            chunks = _tp_overlap_chunks(b * s, d_out)
            if chunks == 1:
                return jax.lax.psum(
                    _project_layer(src, src_q, w_all, idx, mode), tp_axis
                )
            dc = d_out // chunks
            return jnp.concatenate(
                [
                    jax.lax.psum(
                        _project_layer_cols(src, src_q, w_all, idx, mode, ci * dc, dc),
                        tp_axis,
                    )
                    for ci in range(chunks)
                ],
                axis=-1,
            )

        if use_fused_glue:
            # Under tp the psum sits between matmul and residual add, so the
            # residual cannot ride the kernel accumulator there.
            if tp_axis is None:
                x = pallas_ops.qmatmul_pallas_stacked_fused(
                    att, lw_all.wo, idx, residual=x
                ).astype(compute_dtype)
            else:
                x = x + _rowsum(
                    pallas_ops.qmatmul_pallas_stacked_fused(att, lw_all.wo, idx)
                ).astype(compute_dtype)

            # --- FFN block, fused (SwiGLU + residual in-kernel) ---
            gate_up = pallas_ops.qmatmul_pallas_stacked_fused(
                x, lw_all.w13, idx, norm_w=lw_all.rms_ffn, eps=config.norm_eps
            )
            if tp_axis is None:
                x = pallas_ops.qmatmul_pallas_stacked_fused(
                    gate_up, lw_all.w2, idx, swiglu=True, residual=x
                ).astype(compute_dtype)
            else:
                x = x + _rowsum(
                    pallas_ops.qmatmul_pallas_stacked_fused(
                        gate_up, lw_all.w2, idx, swiglu=True
                    )
                ).astype(compute_dtype)
            return x, (k, v)

        att_q = _maybe_quant(att, g, mode)
        x = x + _row_parallel(att, att_q, lw_all.wo).astype(compute_dtype)

        # --- FFN block with SwiGLU (models/qwen3.rs:159-175, layers.rs:466-480) ---
        xn = rms_norm(x, rms_ffn_l, config.norm_eps)
        xq = _maybe_quant(xn, g, mode)
        gate_up = _project_layer(xn, xq, lw_all.w13, idx, mode)
        gate = gate_up[..., : config.hidden_dim]
        up = gate_up[..., config.hidden_dim :]
        h = (gate * jax.nn.sigmoid(gate) * up).astype(compute_dtype)
        h_q = _maybe_quant(h, g, mode)
        x = x + _row_parallel(h, h_q, lw_all.w2).astype(compute_dtype)

        return x, (k, v)

    # The cache pytree scans directly: every leaf (codes, and scales for the
    # quantized pool) carries the leading [n_layers] axis.
    x, (new_k, new_v) = jax.lax.scan(
        layer_step,
        x,
        (
            jnp.arange(config.n_layers, dtype=jnp.int32),
            lw_all.rms_att,
            lw_all.rms_ffn,
            lw_all.q_norm,
            lw_all.k_norm,
            cache,
        ),
    )

    if paged:
        # Scatter each request's new rows into its pages:
        # row at absolute position p lands in page_table[b, p // page] at
        # page row p % page.  Gated requests get an out-of-bounds page id
        # and their writes are dropped.
        page = cache.k.shape[3]
        n_pages = cache.k.shape[1]
        pids = jnp.take_along_axis(page_table, q_pos // page, axis=1)  # [B, S]
        rows = q_pos % page
        if write_mask is not None:
            pids = jnp.where(write_mask[:, None], pids, n_pages)

        def scatter_paged(pool, new_rows):
            # new_rows [L, B, S, kv, hd] → vals [B, S, L, kv, hd] (advanced
            # indices move to the front of the result).
            vals = jnp.transpose(new_rows, (1, 2, 0, 3, 4)).astype(pool.dtype)
            return pool.at[:, pids, :, rows, :].set(vals, mode="drop")

        if hasattr(cache, "k_scale"):
            # INT8 pool: quantize each new row symmetrically per
            # (position, head) and scatter codes + scales.
            def quant_rows(new_rows):  # [L, B, S, kv, hd] f32/bf16
                xf = new_rows.astype(jnp.float32)
                amax = jnp.max(jnp.abs(xf), axis=-1)
                sc = amax / 127.0
                safe = jnp.where(sc == 0.0, 1.0, sc)
                codes = jnp.round(xf / safe[..., None]).astype(jnp.int8)
                return codes, sc

            def scatter_scale(pool_s, sc):  # pool_s [L,P,kv,page]; sc [L,B,S,kv]
                vals = jnp.transpose(sc, (1, 2, 0, 3)).astype(pool_s.dtype)
                return pool_s.at[:, pids, :, rows].set(vals, mode="drop")

            k_codes, k_sc = quant_rows(new_k)
            v_codes, v_sc = quant_rows(new_v)
            new_cache = cache._replace(
                k=scatter_paged(cache.k, k_codes),
                v=scatter_paged(cache.v, v_codes),
                k_scale=scatter_scale(cache.k_scale, k_sc),
                v_scale=scatter_scale(cache.v_scale, v_sc),
            )
        else:
            new_cache = cache._replace(
                k=scatter_paged(cache.k, new_k), v=scatter_paged(cache.v, new_v)
            )
    else:
        # Scatter the window's K/V rows ([L, B, S, kv, hd] → cache's
        # head-major [L, B, kv, T, hd]) at per-request offsets — the only
        # cache write of the whole step.
        def scatter(cache_full, new_rows):
            return _scatter_dense(cache_full, new_rows, pos_start, write_mask)

        def scatter_scale(cache_full, sc):  # [L,B,kv,T], [L,B,S,kv]
            def upd_b(cache_lb, new_lb, p):  # [kv,T], [kv,S]
                return jax.lax.dynamic_update_slice(
                    cache_lb, new_lb.astype(cache_lb.dtype), (0, p)
                )

            def upd_l(cache_l, new_l):  # [B,kv,T], [B,S,kv]
                new_l = jnp.swapaxes(new_l, 1, 2)  # → [B,kv,S]
                updated = jax.vmap(upd_b)(cache_l, new_l, pos_start)
                if write_mask is None:
                    return updated
                return jnp.where(write_mask[:, None, None], updated, cache_l)

            return jax.vmap(upd_l)(cache_full, sc)

        if hasattr(cache, "k_scale"):
            def quant_rows(new_rows):  # [L, B, S, kv, hd]
                xf = new_rows.astype(jnp.float32)
                amax = jnp.max(jnp.abs(xf), axis=-1)
                sc = amax / 127.0
                safe = jnp.where(sc == 0.0, 1.0, sc)
                codes = jnp.round(xf / safe[..., None]).astype(jnp.int8)
                return codes, sc

            k_codes, k_sc = quant_rows(new_k)
            v_codes, v_sc = quant_rows(new_v)
            new_cache = cache._replace(
                k=scatter(cache.k, k_codes),
                v=scatter(cache.v, v_codes),
                k_scale=scatter_scale(cache.k_scale, k_sc),
                v_scale=scatter_scale(cache.v_scale, v_sc),
            )
        else:
            new_cache = cache._replace(
                k=scatter(cache.k, new_k), v=scatter(cache.v, new_v)
            )

    # Final norm + classifier head (models/qwen3.rs:72-76).  Vocab-axis
    # tile padding is dropped inside; under tp the logits stay as local
    # vocab columns (the shard_map wrapper reassembles, parallel/tp.py).
    logits, new_cache = _head(
        config, weights, x, new_cache, mode, g,
        return_all_logits, out_idx, skip_head, tp_axis,
    )
    if greedy_head:
        # Non-megakernel paths reduce here so callers see the same
        # token contract no matter which path engaged.
        logits = jnp.argmax(
            logits[..., : config.vocab_size], axis=-1
        ).astype(jnp.int32)
    return logits, new_cache
