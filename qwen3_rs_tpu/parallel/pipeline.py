"""Pipeline parallelism: GPipe-style layer-stage sharding for inference.

SURVEY §2.4: the reference has no pipeline story; this is the TPU-native
layer-sharding option for models that exceed one slice's HBM.  The stacked
``[n_layers, ...]`` weight pytree shards over a ``pp`` mesh axis (each stage
holds a contiguous slab of ``n_layers / pp`` layers, plus its slab of the KV
cache), and the batch splits into microbatches that flow through the stages:
at tick ``t`` stage ``s`` runs microbatch ``t - s``, then hands its
activations to stage ``s+1`` with a single forward ``ppermute`` over ICI.
A full forward is ``M + P - 1`` ticks with utilization ``M / (M + P - 1)``
per stage — the classic GPipe schedule, expressed as a ``lax.scan`` whose
body is pure SPMD (bubble ticks compute on clamped microbatch indices and
mask their cache writes, so every stage traces one identical program).

Scope: the dense (non-paged) cache path with the XLA attention kernels —
the demonstrator for sharding depth, deliberately not wired into the
serving engine (the north-star models fit per chip; tp is the latency
axis).  The layer math mirrors ``models/qwen3.py::qwen3_forward``'s
``layer_step`` (same ops, same order), minus the Pallas/paged dispatch —
parity-tested against it in tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configuration import ModelConfig
from ..models.qwen3 import (
    KVCache,
    Qwen3Weights,
    _maybe_quant,
    _project,
)
from ..ops.attention import gqa_attention_split
from ..ops.norms import rms_norm
from ..ops.quant import QuantizedTensor, dequantize
from ..ops.rope import apply_rope, rope_table

PP_AXIS = "pp"


def create_pp_mesh(pp: int | None = None, devices=None) -> Mesh:
    """A 1-D (pp,) mesh; adjacent stages sit on ICI-adjacent devices so the
    stage-to-stage ``ppermute`` rides neighbor links."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if pp is not None:
        if pp > len(devices):
            raise ValueError(
                f"pp={pp} exceeds the {len(devices)} available devices"
            )
        devices = devices[:pp]
    return Mesh(np.asarray(devices), (PP_AXIS,))


def validate_pp(config: ModelConfig, pp: int, batch: int, n_microbatches: int):
    if config.n_layers % pp:
        raise ValueError(f"n_layers ({config.n_layers}) must divide over pp={pp}")
    if batch % n_microbatches:
        raise ValueError(
            f"batch ({batch}) must divide into {n_microbatches} microbatches"
        )


def _slab_forward(config, lw, x, k_loc, v_loc, q_pos, pos_mb, cos, sin, mode):
    """Run this stage's layer slab on one microbatch.

    lw: Qwen3LayerWeights with leading [L_loc]; x [mb, S, dim];
    k/v_loc [L_loc, mb, kv, T, hd] (this stage's cache, microbatch rows).
    Returns (x, new_k, new_v) with new rows [L_loc, mb, S, kv, hd].
    """
    b, s = x.shape[:2]
    compute_dtype = x.dtype
    g = config.group_size

    def layer_step(x, scanned):
        lw_l, k_layer, v_layer = scanned

        xn = rms_norm(x, lw_l.rms_att, config.norm_eps)
        xq = _maybe_quant(xn, g, mode)
        qkv = _project(xn, xq, lw_l.wqkv, mode)
        ah, kvd = config.all_heads_dim, config.kv_dim
        q = qkv[..., :ah].reshape(b, s, config.n_heads, config.head_dim)
        k = qkv[..., ah : ah + kvd].reshape(b, s, config.n_kv_heads, config.head_dim)
        v = qkv[..., ah + kvd :].reshape(b, s, config.n_kv_heads, config.head_dim)
        if config.use_qk_norm:
            q = rms_norm(q, lw_l.q_norm, config.norm_eps)
            k = rms_norm(k, lw_l.k_norm, config.norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        att = gqa_attention_split(
            q.astype(compute_dtype),
            k_layer,
            v_layer,
            k.astype(compute_dtype),
            v.astype(compute_dtype),
            q_pos,
            pos_mb,
        )
        att = att.reshape(b, s, config.all_heads_dim)
        att_q = _maybe_quant(att, g, mode)
        x = x + _project(att, att_q, lw_l.wo, mode).astype(compute_dtype)

        xn = rms_norm(x, lw_l.rms_ffn, config.norm_eps)
        xq = _maybe_quant(xn, g, mode)
        gate_up = _project(xn, xq, lw_l.w13, mode)
        gate = gate_up[..., : config.hidden_dim]
        up = gate_up[..., config.hidden_dim :]
        h = (gate * jax.nn.sigmoid(gate) * up).astype(compute_dtype)
        h_q = _maybe_quant(h, g, mode)
        x = x + _project(h, h_q, lw_l.w2, mode).astype(compute_dtype)
        return x, (k, v)

    x, (new_k, new_v) = jax.lax.scan(layer_step, x, (lw, k_loc, v_loc))
    return x, new_k, new_v


def _scatter_slab(cache, rows, mb_off, pos_mb, valid, mbs):
    """Write a microbatch's new K/V rows into this stage's cache slab.

    cache [L_loc, B, kv, T, hd]; rows [L_loc, mb, S, kv, hd]; positions per
    request ``pos_mb`` [mb].  ``valid`` gates bubble-tick garbage out.
    """
    cur = jax.lax.dynamic_slice_in_dim(cache, mb_off, mbs, axis=1)
    rows = jnp.swapaxes(rows, 2, 3)  # → [L_loc, mb, kv, S, hd]

    def upd_b(c_lb, r_lb, p):  # [kv, T, hd], [kv, S, hd]
        return jax.lax.dynamic_update_slice(c_lb, r_lb.astype(c_lb.dtype), (0, p, 0))

    upd = jax.vmap(jax.vmap(upd_b, in_axes=(0, 0, 0)), in_axes=(0, 0, None))(
        cur, rows, pos_mb
    )
    upd = jnp.where(valid, upd, cur)
    return jax.lax.dynamic_update_slice_in_dim(cache, upd, mb_off, axis=1)


def pp_weight_pspecs(weights: Qwen3Weights) -> Qwen3Weights:
    """PartitionSpecs for pipeline sharding, mirroring the weights pytree:
    layer-stacked leaves split on their leading axis over ``pp``;
    embed/head/final-norm replicated (a tp composition would shard those
    over a second axis)."""
    return weights._replace(
        embed=jax.tree.map(lambda _: P(), weights.embed),
        layers=jax.tree.map(lambda _: P(PP_AXIS), weights.layers),
        rms_final=P(),
        lm_head=jax.tree.map(lambda _: P(), weights.lm_head),
    )


def shard_for_pp(weights: Qwen3Weights, cache: KVCache, mesh: Mesh):
    """Place weights/cache for the pipeline: layer axes split over pp."""
    w_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        weights,
        pp_weight_pspecs(weights),
    )
    c_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(PP_AXIS))), cache
    )
    return w_sh, c_sh


def pipelined_forward(
    config: ModelConfig,
    weights: Qwen3Weights,
    tokens: jax.Array,  # [B, S] int32
    cache: KVCache,
    pos_start: jax.Array,  # [B] int32
    mesh: Mesh,
    *,
    n_microbatches: int | None = None,
    mode: str = "fast",
    return_all_logits: bool = False,
) -> tuple[jax.Array, KVCache]:
    """One model step through the layer pipeline; same contract as
    ``qwen3_forward`` (dense-cache path): returns (logits, cache).

    ``n_microbatches`` defaults to the pipeline depth (the smallest count
    that fills every stage once).
    """
    pp = mesh.shape[PP_AXIS]
    b, s = tokens.shape
    m = n_microbatches or min(pp, b)
    validate_pp(config, pp, b, m)
    mbs = b // m
    # Mirror qwen3_forward's residual dtype exactly (f32 only in exact mode).
    compute_dtype = jnp.float32 if mode == "exact" else jnp.bfloat16
    n_ticks = m + pp - 1

    lw_all = weights.layers
    body = functools.partial(
        _pp_body,
        config=config,
        mode=mode,
        m=m,
        mbs=mbs,
        pp=pp,
        s=s,
        compute_dtype=compute_dtype,
        n_ticks=n_ticks,
    )
    lspec = jax.tree.map(lambda _: P(PP_AXIS), lw_all)
    cspec = jax.tree.map(lambda _: P(PP_AXIS), cache)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), QuantizedTensor(P(), P()), lspec, cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    w_sharding = jax.tree.map(lambda sp: NamedSharding(mesh, sp), lspec)
    c_sharding = jax.tree.map(lambda sp: NamedSharding(mesh, sp), cspec)
    hidden, new_cache = fn(
        tokens,
        pos_start,
        jax.device_put(weights.embed, NamedSharding(mesh, P())),
        jax.tree.map(jax.device_put, lw_all, w_sharding),
        jax.tree.map(jax.device_put, cache, c_sharding),
    )

    # Final norm + classifier on the gathered hidden states (replicated;
    # mirrors qwen3_forward's tail).
    if not return_all_logits:
        hidden = hidden[:, -1:, :]
    xn = rms_norm(hidden, weights.rms_final, config.norm_eps)
    xq = _maybe_quant(xn, config.group_size, mode)
    logits = _project(xn, xq, weights.lm_head, mode).astype(jnp.float32)
    logits = logits[..., : config.vocab_size]
    if not return_all_logits:
        logits = logits[:, 0, :]
    return logits, new_cache


def _pp_body(
    tokens,  # [B, S] (replicated)
    pos_start,  # [B]
    embed: QuantizedTensor,  # replicated
    lw,  # Qwen3LayerWeights, leading [L_loc]
    cache,  # KVCache leaves [L_loc, B, kv, T, hd]
    *,
    config,
    mode,
    m,
    mbs,
    pp,
    s,
    compute_dtype,
    n_ticks,
):
    stage = jax.lax.axis_index(PP_AXIS)
    is_first, is_last = stage == 0, stage == pp - 1
    tokens_mb = tokens.reshape(m, mbs, s)
    pos_mb_all = pos_start.reshape(m, mbs)

    rope_len = cache.k.shape[3]
    cos_t, sin_t = rope_table(rope_len, config.head_dim, config.rope_theta)
    perm = [(i, i + 1) for i in range(pp - 1)]

    def tick(carry, t):
        x_in, k_cache, v_cache, out_buf = carry
        mb_idx = t - stage
        valid = (mb_idx >= 0) & (mb_idx < m)
        mb_c = jnp.clip(mb_idx, 0, m - 1)

        # Stage 0 injects a fresh microbatch from the embedding table; later
        # stages consume the activations ppermuted in at the previous tick.
        toks = tokens_mb[mb_c]
        emb = dequantize(
            QuantizedTensor(embed.q[toks], embed.scales[toks]), jnp.float32
        ).astype(compute_dtype)
        x = jnp.where(is_first, emb, x_in)

        pos_mb = pos_mb_all[mb_c]
        q_pos = pos_mb[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        cos = cos_t[q_pos][:, :, None, :]
        sin = sin_t[q_pos][:, :, None, :]

        mb_off = mb_c * mbs
        k_loc = jax.lax.dynamic_slice_in_dim(k_cache, mb_off, mbs, axis=1)
        v_loc = jax.lax.dynamic_slice_in_dim(v_cache, mb_off, mbs, axis=1)
        x, new_k, new_v = _slab_forward(
            config, lw, x, k_loc, v_loc, q_pos, pos_mb, cos, sin, mode
        )

        k_cache = _scatter_slab(k_cache, new_k, mb_off, pos_mb, valid, mbs)
        v_cache = _scatter_slab(v_cache, new_v, mb_off, pos_mb, valid, mbs)

        # The last stage owns finished microbatches; everyone else's slot in
        # out_buf stays zero and the psum below broadcasts the real rows.
        done = jax.lax.dynamic_update_slice_in_dim(
            out_buf, x.astype(out_buf.dtype), mb_off, axis=0
        )
        out_buf = jnp.where(valid & is_last, done, out_buf)

        x_next = jax.lax.ppermute(x, PP_AXIS, perm)
        return (x_next, k_cache, v_cache, out_buf), None

    dim = config.dim
    carry0 = (
        jnp.zeros((mbs, s, dim), compute_dtype),
        cache.k,
        cache.v,
        jnp.zeros((m * mbs, s, dim), compute_dtype),
    )
    (_, k_cache, v_cache, out_buf), _ = jax.lax.scan(
        tick, carry0, jnp.arange(n_ticks, dtype=jnp.int32)
    )
    hidden = jax.lax.psum(out_buf, PP_AXIS)
    return hidden, cache._replace(k=k_cache, v=v_cache)
