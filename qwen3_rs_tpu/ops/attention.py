"""Grouped-query attention over a static-shape KV cache.

TPU-native counterpart of the reference attention inner loop
(qwen3-inference/src/layers.rs:287-420).  The reference walks positions
``t ∈ [0, pos]`` per head on one core; here the whole (batch, head, query,
key) score tensor is computed as batched matmuls on the MXU with a causal
mask — one fused XLA region per layer.  A Pallas flash-attention kernel
covers the long-context path (ops/pallas/flash_attention.py).

Conventions:
* queries      q:     [B, S, n_heads, head_dim]
* cache        k, v:  [B, n_kv_heads, T, head_dim]  (T = allocated seq_len;
  head-major so each head's [T, head_dim] slab is contiguous — the layout
  the flash kernel DMAs in long bursts)
* window k/v   [B, S, n_kv_heads, head_dim] (projection output order)
* ``q_pos``    absolute position of each query row: [B, S] int32
* attention scale is 1/sqrt(head_dim) (layers.rs:375); softmax in f32 with
  max subtraction (layers.rs:495-506); GQA maps query head h to kv head
  ``h // (n_heads // n_kv_heads)`` (layers.rs:385).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_softmax_partials(m1, l1, a1, m2, l2, a2):
    """Combine two online-softmax partial triples (max, sum, acc) in f32.

    The single definition of the guarded rescale-and-add rule: a fully
    masked part carries ``m = -inf`` and must contribute exactly zero
    (``isfinite`` guard keeps ``exp(-inf - -inf)`` from producing NaN).
    ``_cache_attn_online`` and ``_merge_window`` inline the same rule in
    fused form (one side's rescale folded into its score exponentiation);
    any numerics change here must be mirrored there.
    """
    m = jnp.maximum(m1, m2)
    r1 = jnp.where(jnp.isfinite(m1), jnp.exp(m1 - m), 0.0)
    r2 = jnp.where(jnp.isfinite(m2), jnp.exp(m2 - m), 0.0)
    return m, l1 * r1 + l2 * r2, a1 * r1 + a2 * r2


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_pos: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Causal GQA attention. Returns [B, S, n_heads, head_dim] in q.dtype.

    Key/value rows at cache index t participate for query at absolute
    position p iff t <= p (matching the reference's t ∈ [0, pos] walk,
    layers.rs:388-417).
    """
    from . import pallas as pallas_ops

    if use_pallas is None:
        use_pallas = pallas_ops.pallas_enabled()
    if use_pallas:
        return pallas_ops.flash_gqa_attention(q, k, v, q_pos)
    return gqa_attention_xla(q, k, v, q_pos)


# Above this many query rows, prefill attention runs in query chunks: the
# full [S, T] score tensor at S=T=4096 is ~0.5 GB per (kv, mul) pair — the
# chunked form bounds it to [CHUNK, T] and scans.
_QUERY_CHUNK = 512

# Cache-prefix attention reads the cache in key chunks of this size inside a
# position-bounded loop: only ceil(max(pos)/CHUNK) chunks are streamed from
# HBM instead of the whole allocated window T.  At decode position p with a
# T-row cache this cuts cache traffic by T/p; at prefill from pos 0 the
# cache part is skipped entirely.
_CACHE_KEY_CHUNK = 512


def _pick_cache_chunk(t: int) -> int | None:
    """Largest power-of-two chunk ≤ _CACHE_KEY_CHUNK dividing ``t``; None →
    dense fallback (tiny or oddly-sized windows)."""
    c = _CACHE_KEY_CHUNK
    while c >= 128:
        if t % c == 0 and t > c:
            return c
        c //= 2
    return None


def gqa_attention_split(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    q_pos: jax.Array,
    pos_start: jax.Array,
    *,
    use_pallas: bool | None = None,
    k_scale_cache: jax.Array | None = None,
    v_scale_cache: jax.Array | None = None,
) -> jax.Array:
    """Causal GQA attention over a cached prefix plus the current window.

    q:        [B, S, n_heads, head_dim] — queries for the current window
    k_cache:  [B, n_kv, T, head_dim]    — cache; rows t < pos_start[b] valid
    k_new:    [B, S, n_kv, head_dim]    — keys for the window itself
    q_pos:    [B, S] absolute positions; pos_start: [B]
    k/v_scale_cache: [B, n_kv, T] — per-row scales when the cache stores
    INT8 codes (models/qwen3.py QuantizedKVCache); rows dequantize as they
    are read

    Equivalent to attending over the fully-updated cache (the reference's
    t ∈ [0, pos] walk) but without materializing the cache update before
    attention: the window's K/V never round-trip through HBM, and the model's
    layer scan can emit just the new rows instead of restacking the cache.
    Softmax is computed jointly across both parts (shared max / sum).

    Long windows are processed in query chunks to bound the score tensor.
    """
    s = q.shape[1]
    if s > _QUERY_CHUNK and s % _QUERY_CHUNK == 0:
        outs = []
        for c in range(s // _QUERY_CHUNK):
            sl = slice(c * _QUERY_CHUNK, (c + 1) * _QUERY_CHUNK)
            # Causal key slice: chunk c's queries sit at window rows
            # < (c+1)·CHUNK, so later keys are fully masked — skip their
            # score/value matmuls entirely (halves window-attention work
            # across the chunk sweep: Σ c·CHUNK² vs S² score elements).
            ksl = slice(0, (c + 1) * _QUERY_CHUNK)
            outs.append(
                _split_attn_body(
                    q[:, sl],
                    k_cache,
                    v_cache,
                    k_new[:, ksl],
                    v_new[:, ksl],
                    q_pos[:, sl],
                    pos_start,
                    win_offset=c * _QUERY_CHUNK,
                    k_scale_cache=k_scale_cache,
                    v_scale_cache=v_scale_cache,
                )
            )
        return jnp.concatenate(outs, axis=1)
    return _split_attn_body(
        q, k_cache, v_cache, k_new, v_new, q_pos, pos_start, win_offset=0,
        k_scale_cache=k_scale_cache, v_scale_cache=v_scale_cache,
    )


def _split_attn_body(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    q_pos: jax.Array,
    pos_start: jax.Array,
    *,
    win_offset: int,
    k_scale_cache: jax.Array | None = None,
    v_scale_cache: jax.Array | None = None,
) -> jax.Array:
    """One query chunk: q rows sit at window offsets win_offset..+S_q over
    the full k_new/v_new window [S_w]."""
    b, s, n_heads, head_dim = q.shape
    n_kv, t = k_cache.shape[1], k_cache.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (head_dim**0.5)

    qf = q.reshape(b, s, n_kv, kv_mul, head_dim).astype(jnp.float32)

    def deq_k(x):
        xf = x.astype(jnp.float32)
        return xf if k_scale_cache is None else xf * k_scale_cache[..., :, None]

    def deq_v(x):
        xf = x.astype(jnp.float32)
        return xf if v_scale_cache is None else xf * v_scale_cache[..., :, None]

    chunk = _pick_cache_chunk(t)
    if chunk is None:
        # Dense cache part: one masked contraction over the whole window.
        sc = jnp.einsum(
            "bsnmh,bnth->bnmst",
            qf,
            deq_k(k_cache),
            preferred_element_type=jnp.float32,
        ) * scale
        cache_mask = (
            jnp.arange(t, dtype=jnp.int32)[None, None, :] < pos_start[:, None, None]
        )  # [B, 1, T]
        sc = jnp.where(cache_mask[:, None, None, :, :], sc, -jnp.inf)
        m_c = jnp.max(sc, axis=-1, keepdims=True)  # [B,KV,M,S,1], may be -inf
        ec = jnp.where(jnp.isfinite(m_c), jnp.exp(sc - m_c), 0.0)
        l_c = jnp.sum(ec, axis=-1, keepdims=True)
        acc_c = jnp.einsum(
            "bnmst,bnth->bnmsh",
            ec,
            deq_v(v_cache),
            preferred_element_type=jnp.float32,
        )
    else:
        fetch = None
        if k_scale_cache is not None:
            def fetch(c):
                start = c * chunk
                k_c = jax.lax.dynamic_slice_in_dim(k_cache, start, chunk, 2)
                v_c = jax.lax.dynamic_slice_in_dim(v_cache, start, chunk, 2)
                ks = jax.lax.dynamic_slice_in_dim(k_scale_cache, start, chunk, 2)
                vs = jax.lax.dynamic_slice_in_dim(v_scale_cache, start, chunk, 2)
                return (
                    k_c.astype(jnp.float32) * ks[..., None],
                    v_c.astype(jnp.float32) * vs[..., None],
                )
        m_c, l_c, acc_c = _cache_attn_online(
            qf, k_cache, v_cache, pos_start, chunk=chunk, scale=scale,
            fetch_chunk=fetch,
        )

    return _merge_window(
        qf, m_c, l_c, acc_c, k_new, v_new, win_offset=win_offset, scale=scale,
        out_dtype=q.dtype,
    )


def _merge_window(
    qf: jax.Array,
    m_c: jax.Array,
    l_c: jax.Array,
    acc_c: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    *,
    win_offset: int,
    scale: float,
    out_dtype,
) -> jax.Array:
    """Combine the cache part's (max, sum, acc) with the in-window causal
    attention into the final normalized output [B, S, n_heads, hd]."""
    b, s, n_kv, kv_mul, head_dim = qf.shape

    # Window part: [B, KV, M, S_q, S_w], causal within the full window
    # (global row index win_offset + i attends window cols j <= that index).
    s_w = k_new.shape[1]
    sn = jnp.einsum(
        "bsnmh,bjnh->bnmsj", qf, k_new.astype(jnp.float32), preferred_element_type=jnp.float32
    ) * scale
    win_mask = (
        win_offset + jnp.arange(s, dtype=jnp.int32)[None, :, None]
        >= jnp.arange(s_w, dtype=jnp.int32)[None, None, :]
    )  # [1, S_q, S_w]
    sn = jnp.where(win_mask[:, None, None, :, :], sn, -jnp.inf)

    # Merge cache and window softmax parts.  The window always contains the
    # self key, so the joint max is finite even when the cache part is empty.
    m = jnp.maximum(m_c, jnp.max(sn, axis=-1, keepdims=True))
    r_c = jnp.where(jnp.isfinite(m_c), jnp.exp(m_c - m), 0.0)
    en = jnp.exp(sn - m)
    denom = l_c * r_c + jnp.sum(en, axis=-1, keepdims=True)

    out = acc_c * r_c + jnp.einsum(
        "bnmsj,bjnh->bnmsh", en, v_new.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    out = out / denom
    # [B, KV, M, S, hd] → [B, S, KV, M, hd] → [B, S, n_heads, hd]
    out = jnp.transpose(out, (0, 3, 1, 2, 4))
    return out.reshape(b, s, n_kv * kv_mul, head_dim).astype(out_dtype)


def gqa_attention_split_paged(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    page_table: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    pos_start: jax.Array,
    *,
    k_scale_pool: jax.Array | None = None,
    v_scale_pool: jax.Array | None = None,
) -> jax.Array:
    """Causal GQA attention over a paged cache prefix plus the current window.

    q:          [B, S, n_heads, hd] — queries at absolute rows pos_start..+S
    k/v_pool:   [P, n_kv, page, hd] — one layer's page pool
    page_table: [B, max_pages] int32 — page ids covering rows < pos_start
    k/v_new:    [B, S, n_kv, hd]
    k/v_scale_pool: [P, n_kv, page] — per-row scales when the pool stores
    INT8 codes (serving/paged_cache.py QuantizedPagedKVCache); gathered
    chunks are dequantized right after the gather.

    Same math as :func:`gqa_attention_split`, with each cache chunk gathered
    from the pool by page id (serving/paged_cache.py).  Only
    ``ceil(max(pos_start)/page)`` pages are touched per step.  Long query
    windows are processed in chunks like the dense path.
    """
    s = q.shape[1]
    if s > _QUERY_CHUNK and s % _QUERY_CHUNK == 0:
        outs = []
        for c in range(s // _QUERY_CHUNK):
            sl = slice(c * _QUERY_CHUNK, (c + 1) * _QUERY_CHUNK)
            ksl = slice(0, (c + 1) * _QUERY_CHUNK)  # causal key slice (see dense path)
            outs.append(
                _paged_attn_body(
                    q[:, sl], k_pool, v_pool, page_table,
                    k_new[:, ksl], v_new[:, ksl], pos_start,
                    win_offset=c * _QUERY_CHUNK,
                    k_scale_pool=k_scale_pool, v_scale_pool=v_scale_pool,
                )
            )
        return jnp.concatenate(outs, axis=1)
    return _paged_attn_body(
        q, k_pool, v_pool, page_table, k_new, v_new, pos_start, win_offset=0,
        k_scale_pool=k_scale_pool, v_scale_pool=v_scale_pool,
    )


def _paged_attn_body(
    q, k_pool, v_pool, page_table, k_new, v_new, pos_start, *, win_offset: int,
    k_scale_pool=None, v_scale_pool=None,
) -> jax.Array:
    b, s, n_heads, head_dim = q.shape
    n_kv, page = k_pool.shape[1], k_pool.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (head_dim**0.5)
    qf = q.reshape(b, s, n_kv, kv_mul, head_dim).astype(jnp.float32)

    def fetch_pages(c):
        pids = jax.lax.dynamic_index_in_dim(page_table, c, 1, keepdims=False)  # [B]
        k_c = k_pool[pids].astype(jnp.float32)  # [B, kv, page, hd]
        v_c = v_pool[pids].astype(jnp.float32)
        if k_scale_pool is not None:
            k_c = k_c * k_scale_pool[pids][..., None]
            v_c = v_c * v_scale_pool[pids][..., None]
        return k_c, v_c

    m_c, l_c, acc_c = _cache_attn_online(
        qf, None, None, pos_start, chunk=page, scale=scale, fetch_chunk=fetch_pages
    )
    return _merge_window(
        qf, m_c, l_c, acc_c, k_new, v_new, win_offset=win_offset, scale=scale,
        out_dtype=q.dtype,
    )


def _cache_attn_online(
    qf: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos_start: jax.Array,
    *,
    chunk: int,
    scale: float,
    fetch_chunk=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Online-softmax attention over the valid cache prefix, reading only
    ``ceil(max(pos_start)/chunk)`` key chunks from HBM.

    qf: [B, S, KV, M, hd] f32 queries; k/v_cache: [B, KV, T, hd].
    ``fetch_chunk(c)`` optionally overrides how chunk ``c`` is read (the
    paged cache gathers by page id); it must return f32
    ``(k_c, v_c) [B, KV, chunk, hd]``.
    Returns running (max [B,KV,M,S,1], sum [B,KV,M,S,1], acc [B,KV,M,S,hd]);
    max is -inf where no cache rows are valid.
    """
    b, s, n_kv, kv_mul, head_dim = qf.shape
    n_chunks_live = jax.lax.div(
        jnp.max(pos_start) + (chunk - 1), jnp.int32(chunk)
    )

    m0 = jnp.full((b, n_kv, kv_mul, s, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, n_kv, kv_mul, s, 1), jnp.float32)
    acc0 = jnp.zeros((b, n_kv, kv_mul, s, head_dim), jnp.float32)

    def default_fetch(c):
        start = c * chunk
        k_c = jax.lax.dynamic_slice_in_dim(k_cache, start, chunk, 2)
        v_c = jax.lax.dynamic_slice_in_dim(v_cache, start, chunk, 2)
        return k_c.astype(jnp.float32), v_c.astype(jnp.float32)

    fetch = fetch_chunk or default_fetch

    def body(c, carry):
        m, l, acc = carry
        k_c, v_c = fetch(c)
        sc = jnp.einsum(
            "bsnmh,bnch->bnmsc", qf, k_c, preferred_element_type=jnp.float32
        ) * scale
        tidx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = tidx[None, :] < pos_start[:, None]  # [B, C]
        sc = jnp.where(valid[:, None, None, None, :], sc, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        finite = jnp.isfinite(m_new)
        r = jnp.where(finite, jnp.exp(m - m_new), 0.0)
        p = jnp.where(finite, jnp.exp(sc - m_new), 0.0)
        l_new = l * r + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * r + jnp.einsum(
            "bnmsc,bnch->bnmsh", p, v_c, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    return jax.lax.fori_loop(0, n_chunks_live, body, (m0, l0, acc0))


def gqa_attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, q_pos: jax.Array
) -> jax.Array:
    """Dense attention over a fully-written cache (k/v [B, n_kv, T, hd])."""
    b, s, n_heads, head_dim = q.shape
    _, n_kv, t, _ = k.shape
    kv_mul = n_heads // n_kv
    scale = 1.0 / (head_dim**0.5)

    qf = q.reshape(b, s, n_kv, kv_mul, head_dim).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores[b, kv, m, s, t] = q · k * scale
    scores = jnp.einsum("bsnmh,bnth->bnmst", qf, kf, preferred_element_type=jnp.float32)
    scores = scores * scale

    key_idx = jnp.arange(t, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= q_pos[:, :, None]  # [B, S, T]
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnmst,bnth->bsnmh", att, vf, preferred_element_type=jnp.float32)
    return out.reshape(b, s, n_heads, head_dim).astype(q.dtype)
