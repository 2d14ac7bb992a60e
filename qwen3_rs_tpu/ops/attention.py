"""Grouped-query attention over a static-shape KV cache.

TPU-native counterpart of the reference attention inner loop
(qwen3-inference/src/layers.rs:287-420).  The reference walks positions
``t ∈ [0, pos]`` per head on one core; here the whole (batch, head, query,
key) score tensor is computed as batched matmuls on the MXU with a causal
mask — one fused XLA region per layer.  A Pallas flash-attention kernel
covers the long-context path (ops/pallas/flash_attention.py).

Conventions:
* queries      q:     [B, S, n_heads, head_dim]
* cache        k, v:  [B, T, n_kv_heads, head_dim]  (T = allocated seq_len)
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


def gqa_attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, q_pos: jax.Array
) -> jax.Array:
    b, s, n_heads, head_dim = q.shape
    _, t, n_kv, _ = k.shape
    kv_mul = n_heads // n_kv
    scale = 1.0 / (head_dim**0.5)

    qf = q.reshape(b, s, n_kv, kv_mul, head_dim).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores[b, kv, m, s, t] = q · k * scale
    scores = jnp.einsum("bsnmh,btnh->bnmst", qf, kf, preferred_element_type=jnp.float32)
    scores = scores * scale

    key_idx = jnp.arange(t, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= q_pos[:, :, None]  # [B, S, T]
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnmst,btnh->bsnmh", att, vf, preferred_element_type=jnp.float32)
    return out.reshape(b, s, n_heads, head_dim).astype(q.dtype)
