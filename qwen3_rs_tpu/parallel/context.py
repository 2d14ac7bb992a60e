"""Context (sequence) parallelism: ring attention for sharded prefill.

SURVEY §2.4 / §5: the reference iterates all prior positions on one core
(layers.rs:374-419) and has no sequence scaling story beyond allocating
bigger buffers.  The TPU-native extension point is **ring attention**
(arXiv:2310.01889 blockwise/ring family): shard the prompt rows over an
``sp`` mesh axis, keep queries resident, and rotate the K/V shards around
the ring with ``ppermute`` — each of the N steps overlaps a neighbor
exchange over ICI with the attention of the local queries against the
currently-held K/V block.  Peak per-chip score memory drops from
``S × S`` to ``(S/N)²`` and the sequence scales past one chip's HBM.

This is deliberately a standalone layer (not wired into the serving
engine): the north-star configs (4k prefill) fit per chip, so context
parallelism is exercised through its own API + the CPU-mesh tests, and a
model integration can route prefill attention here when sequences outgrow
a chip.

Numerics: online-softmax accumulation in f32 — the same merge rule as
ops/attention.py — so the result matches single-device attention up to
reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import merge_softmax_partials

SP_AXIS = "sp"


def _local_block_attention(q, k, v, q_start, k_start, scale):
    """Causal GQA attention of local queries against one K/V block.

    q: [B, Sq, KV, M, hd] f32 (global rows q_start..); k/v: [B, Sk, KV, hd]
    (global rows k_start..).  Returns (m, l, acc) partials.
    """
    sq, sk = q.shape[1], k.shape[1]
    scores = jnp.einsum(
        "bsnmh,bjnh->bnmsj", q, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    rows = q_start + jnp.arange(sq, dtype=jnp.int32)[:, None]
    cols = k_start + jnp.arange(sk, dtype=jnp.int32)[None, :]
    scores = jnp.where((rows >= cols)[None, None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)  # may be -inf (fully masked)
    e = jnp.where(jnp.isfinite(m), jnp.exp(scores - m), 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bnmsj,bjnh->bnmsh", e, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m, l, acc


def _ring_body(q, k, v, *, axis_name: str, n_shards: int, scale: float):
    """shard_map body: local q [B, S/N, heads, hd]; k/v local shards."""
    b, s_loc, n_heads, hd = q.shape
    n_kv = k.shape[2]
    kv_mul = n_heads // n_kv
    idx = jax.lax.axis_index(axis_name)

    qf = q.reshape(b, s_loc, n_kv, kv_mul, hd).astype(jnp.float32)
    q_start = idx * s_loc

    m = jnp.full((b, n_kv, kv_mul, s_loc, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, n_kv, kv_mul, s_loc, 1), jnp.float32)
    acc = jnp.zeros((b, n_kv, kv_mul, s_loc, hd), jnp.float32)

    # Ring: at step t this shard holds the block originally owned by
    # (idx + t) mod N; each step sends the held block "down" the ring and
    # receives the next — the ppermute overlaps the block's attention math.
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    for t in range(n_shards):
        src = (idx + t) % n_shards
        mb, lb, ab = _local_block_attention(
            qf, k, v, q_start, src * s_loc, scale
        )
        m, l, acc = merge_softmax_partials(m, l, acc, mb, lb, ab)
        if t + 1 < n_shards:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    out = acc / jnp.where(l == 0.0, 1.0, l)  # row 0 of shard 0 is never empty
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, s_loc, n_heads, hd)
    return out.astype(q.dtype)


def ring_prefill_attention_inner(
    q: jax.Array,  # [B, S, n_heads, hd]
    k: jax.Array,  # [B, S, n_kv, hd]
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = SP_AXIS,
) -> jax.Array:
    """Jit-composable form: no device_put — usable inside a jitted forward
    (models/qwen3.py routes fresh prefills here on an sp mesh); GSPMD
    inserts any resharding the caller's layout requires."""
    n_shards = mesh.shape[axis]
    if q.shape[1] % n_shards:
        raise ValueError(
            f"sequence length {q.shape[1]} must divide over {axis}={n_shards}"
        )
    scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_body, axis_name=axis, n_shards=n_shards, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ring_prefill_attention(
    q: jax.Array,  # [B, S, n_heads, hd], S sharded over sp
    k: jax.Array,  # [B, S, n_kv, hd]
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = SP_AXIS,
) -> jax.Array:
    """Causal GQA prefill attention with the sequence sharded over ``axis``.

    Equivalent to ops/attention.py ``gqa_attention_xla`` over the gathered
    sequence (rows at absolute positions 0..S-1), computed without ever
    materializing a full K/V copy per chip.  ``S`` must divide evenly over
    the axis.
    """
    n_shards = mesh.shape[axis]
    if q.shape[1] % n_shards:
        raise ValueError(
            f"sequence length {q.shape[1]} must divide over {axis}={n_shards}"
        )
    scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_body, axis_name=axis, n_shards=n_shards, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)
    return fn(
        jax.device_put(q, sharding),
        jax.device_put(k, sharding),
        jax.device_put(v, sharding),
    )
