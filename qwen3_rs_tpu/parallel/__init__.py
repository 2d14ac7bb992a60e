from .context import SP_AXIS, ring_prefill_attention
from .mesh import DP_AXIS, TP_AXIS, create_mesh, single_device_mesh
from .pipeline import PP_AXIS, create_pp_mesh, pipelined_forward, shard_for_pp
from .sharding import (
    cache_pspecs,
    shard_cache,
    shard_weights,
    validate_tp,
    weight_pspecs,
)

__all__ = [
    "DP_AXIS",
    "TP_AXIS",
    "SP_AXIS",
    "PP_AXIS",
    "create_mesh",
    "create_pp_mesh",
    "single_device_mesh",
    "weight_pspecs",
    "cache_pspecs",
    "shard_weights",
    "shard_cache",
    "validate_tp",
    "ring_prefill_attention",
    "pipelined_forward",
    "shard_for_pp",
]
