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
) -> jax.Array:
    """Causal GQA attention over a cached prefix plus the current window.

    q:        [B, S, n_heads, head_dim] — queries for the current window
    k_cache:  [B, n_kv, T, head_dim]    — cache; rows t < pos_start[b] valid
    k_new:    [B, S, n_kv, head_dim]    — keys for the window itself
    q_pos:    [B, S] absolute positions; pos_start: [B]

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
            outs.append(
                _split_attn_body(
                    q[:, sl],
                    k_cache,
                    v_cache,
                    k_new,
                    v_new,
                    q_pos[:, sl],
                    pos_start,
                    win_offset=c * _QUERY_CHUNK,
                )
            )
        return jnp.concatenate(outs, axis=1)
    return _split_attn_body(q, k_cache, v_cache, k_new, v_new, q_pos, pos_start, win_offset=0)


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
) -> jax.Array:
    """One query chunk: q rows sit at window offsets win_offset..+S_q over
    the full k_new/v_new window [S_w]."""
    b, s, n_heads, head_dim = q.shape
    n_kv, t = k_cache.shape[1], k_cache.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (head_dim**0.5)

    qf = q.reshape(b, s, n_kv, kv_mul, head_dim).astype(jnp.float32)

    # Cache part: [B, KV, M, S, T], valid where t < pos_start.
    sc = jnp.einsum(
        "bsnmh,bnth->bnmst", qf, k_cache.astype(jnp.float32), preferred_element_type=jnp.float32
    ) * scale
    cache_mask = (
        jnp.arange(t, dtype=jnp.int32)[None, None, :] < pos_start[:, None, None]
    )  # [B, 1, T]
    sc = jnp.where(cache_mask[:, None, None, :, :], sc, -jnp.inf)

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

    # Joint softmax (the window always contains the self key, so the max is
    # finite even when the cache part is fully masked).
    m = jnp.maximum(
        jnp.max(sc, axis=-1, keepdims=True), jnp.max(sn, axis=-1, keepdims=True)
    )
    ec = jnp.exp(sc - m)
    en = jnp.exp(sn - m)
    denom = jnp.sum(ec, axis=-1, keepdims=True) + jnp.sum(en, axis=-1, keepdims=True)

    out = jnp.einsum(
        "bnmst,bnth->bsnmh", ec, v_cache.astype(jnp.float32), preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bnmsj,bjnh->bsnmh", en, v_new.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    # denom [B, KV, M, S, 1] → [B, S, KV, M, 1] to divide the output layout.
    out = out / jnp.transpose(denom, (0, 3, 1, 2, 4))
    return out.reshape(b, s, n_heads, head_dim).astype(q.dtype)


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
