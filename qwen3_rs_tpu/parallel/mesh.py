"""Device-mesh construction helpers.

The reference is single-process/single-device; its only parallelism is a
rayon thread pool (SURVEY §2.4).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with named axes:

* ``dp`` — data/request parallelism (continuous batching across hosts, DCN)
* ``tp`` — tensor parallelism (weights + KV cache sharded over ICI)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
TP_AXIS = "tp"


def create_mesh(
    tp: Optional[int] = None,
    dp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: all devices on the tp axis (decode latency first).  ICI-major
    ordering: jax.devices() enumerates devices so that adjacent ids share
    ICI links; tp is the fastest-varying axis so tensor-parallel collectives
    ride ICI while dp spans hosts/DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp ({dp}) × tp ({tp}) must equal device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def single_device_mesh() -> Mesh:
    return create_mesh(tp=1, dp=1, devices=jax.devices()[:1])
