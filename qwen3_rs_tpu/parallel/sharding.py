"""Sharding rules: PartitionSpecs for weights, KV cache and activations.

The reference has no distributed execution at all (SURVEY §2.4); this module
is the TPU-native design in its place.  Layout choices:

* Column-parallel (output-dim ``tp``): wq/wk/wv (head-contiguous rows, so the
  per-head reshape keeps the head axis sharded), w1/w3, lm_head (vocab rows),
  embed (vocab rows).
* Row-parallel (input-dim ``tp``): wo, w2 — XLA inserts the reduce
  (psum/reduce-scatter) after the contraction automatically under GSPMD.
* KV cache sharded over kv heads on ``tp`` and over batch on ``dp`` —
  attention is then fully local to each tp shard (GQA kv-head locality).
* Per-group scales shard exactly like their int8 codes (the group axis
  divides the contraction axis, untouched by tp for column-parallel weights
  and divided along groups for row-parallel ones — group_size | in_dim/tp is
  validated by ``validate_tp``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configuration import ModelConfig
from ..models.qwen3 import KVCache, Qwen3LayerWeights, Qwen3Weights
from ..ops.quant import QuantizedTensor
from .mesh import DP_AXIS, TP_AXIS


def validate_tp(config: ModelConfig, tp: int) -> None:
    """Check that a tp degree is compatible with the model's shapes.

    Note: the fused wqkv/w13 projections shard on their concatenated out
    axis; q|k|v split boundaries align with shard boundaries when tp divides
    n_kv_heads (Qwen3's n_heads = 2·n_kv_heads ⇒ aligned for even tp).
    Misaligned splits remain correct under GSPMD, at extra collective cost.
    """
    if config.n_kv_heads % tp and tp % config.n_kv_heads:
        raise ValueError(
            f"tp={tp} incompatible with n_kv_heads={config.n_kv_heads}: one must divide the other"
        )
    if config.n_heads % tp:
        raise ValueError(f"tp={tp} must divide n_heads={config.n_heads}")
    for name, out_dim in (
        ("hidden_dim", config.hidden_dim),
        ("all_heads_dim", config.all_heads_dim),
    ):
        if out_dim % tp:
            raise ValueError(f"tp={tp} must divide {name}={out_dim}")
    for name, in_dim in (
        ("all_heads_dim", config.all_heads_dim),
        ("hidden_dim", config.hidden_dim),
    ):
        shard = in_dim // tp
        if shard % config.group_size:
            raise ValueError(
                f"tp={tp} shards {name}={in_dim} into {shard}, which breaks "
                f"group_size={config.group_size} alignment"
            )


def _qt_spec(spec_q: P) -> QuantizedTensor:
    """Scales follow the codes: same spec (the group axis replaces the last
    axis and shards identically)."""
    return QuantizedTensor(spec_q, spec_q)


def weight_pspecs(config: ModelConfig) -> Qwen3Weights:
    """PartitionSpec pytree matching Qwen3Weights (in-major weight layout:
    codes [L, in, out], scales [L, in/g, out])."""
    col = _qt_spec(P(None, None, TP_AXIS))  # shard the out axis
    row = _qt_spec(P(None, TP_AXIS, None))  # shard the in (contraction) axis
    layers = Qwen3LayerWeights(
        rms_att=P(None, None),
        rms_ffn=P(None, None),
        q_norm=P(None, None),
        k_norm=P(None, None),
        wqkv=col,
        wo=row,
        w13=col,
        w2=row,
    )
    return Qwen3Weights(
        embed=_qt_spec(P(TP_AXIS, None)),  # [V(tp), dim] row-major
        layers=layers,
        rms_final=P(None),
        lm_head=_qt_spec(P(None, TP_AXIS)),  # [dim, V_pad(tp)]
    )


def cache_pspecs() -> KVCache:
    """[L, B(dp), n_kv(tp), T, head_dim]."""
    spec = P(None, DP_AXIS, TP_AXIS, None, None)
    return KVCache(spec, spec)


def shard_weights(weights: Qwen3Weights, mesh: Mesh, config: ModelConfig) -> Qwen3Weights:
    """Place a host/single-device weight pytree onto the mesh."""
    validate_tp(config, mesh.shape[TP_AXIS])
    specs = weight_pspecs(config)
    # Re-key the spec tree onto the weights' exact structure: linear layers
    # may be QuantizedTensor (int8) or Q4Tensor (nibble-packed int4) — both
    # flatten to (codes, scales) leaves in the same order, and the specs
    # apply unchanged.  In-axis (row-parallel) sharding stays consistent for
    # packed codes because packing is group-local and shard boundaries fall
    # on group boundaries (validate_tp guarantees tp divides the group
    # count).
    specs = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(weights), jax.tree_util.tree_leaves(specs)
    )
    return jax.tree.map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), weights, specs
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_pspecs()
    return jax.tree.map(
        lambda c, s: jax.device_put(c, NamedSharding(mesh, s)), cache, specs
    )


def logits_spec() -> P:
    return P(DP_AXIS, None)


def token_spec() -> P:
    return P(DP_AXIS, None)
