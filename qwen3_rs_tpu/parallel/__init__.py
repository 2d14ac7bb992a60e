from .mesh import DP_AXIS, TP_AXIS, create_mesh, single_device_mesh
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
    "create_mesh",
    "single_device_mesh",
    "weight_pspecs",
    "cache_pspecs",
    "shard_weights",
    "shard_cache",
    "validate_tp",
]
