"""Multi-host runtime initialization + scaling benchmark harness.

The reference has no distributed execution of any kind (SURVEY §2.4); this
module is the TPU-native multi-host story:

* ``initialize_distributed`` wraps ``jax.distributed.initialize`` — run once
  per host process before any backend use; afterwards ``jax.devices()``
  spans the pod slice and the same mesh/sharding code paths apply (tp over
  ICI within a host/slice, dp across hosts over DCN).
* ``scaling_report`` measures decode throughput at increasing device counts
  on whatever devices exist (real chips in a pod, or a virtual CPU mesh in
  tests) and reports scaling efficiency vs the single-device baseline — the
  BASELINE.md ≥85% efficiency harness.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration import ModelConfig
from ..models.qwen3 import Qwen3Weights, init_kv_cache, qwen3_forward
from .mesh import DP_AXIS, TP_AXIS, create_mesh
from .sharding import cache_pspecs, shard_cache, shard_weights, weight_pspecs

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (one call per host process).

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env); arguments override for manual clusters.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def _throughput_on(
    config: ModelConfig,
    weights: Qwen3Weights,
    devices: Sequence[jax.Device],
    *,
    tp: int,
    batch_per_dp: int,
    steps: int = 32,
) -> float:
    """Decode tokens/sec over a (dp, tp) mesh on the given devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = len(devices)
    dp = n // tp
    mesh = create_mesh(tp=tp, dp=dp, devices=devices)
    batch = batch_per_dp * dp

    w = shard_weights(weights, mesh, config)
    cache = shard_cache(init_kv_cache(config, batch, dtype=jnp.bfloat16), mesh)
    data = NamedSharding(mesh, P(DP_AXIS, None))
    posns = NamedSharding(mesh, P(DP_AXIS))

    def decode_n(weights, token, cache, pos, n_steps):
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = qwen3_forward(config, weights, token, cache, pos, mode="fast")
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache, pos + 1), nxt

        carry, toks = jax.lax.scan(body, (token, cache, pos), None, length=n_steps)
        return toks, carry[1]

    def run(n_steps):
        f = jax.jit(
            functools.partial(decode_n, n_steps=n_steps),
            in_shardings=(
                jax.tree.map(lambda s: NamedSharding(mesh, s), weight_pspecs(config)),
                data,
                jax.tree.map(lambda s: NamedSharding(mesh, s), cache_pspecs()),
                posns,
            ),
            donate_argnums=(2,),
        )
        c = shard_cache(init_kv_cache(config, batch, dtype=jnp.bfloat16), mesh)
        tok = jax.device_put(jnp.ones((batch, 1), jnp.int32), data)
        pos = jax.device_put(jnp.zeros(batch, jnp.int32), posns)
        toks, _ = f(w, tok, c, pos)
        np.asarray(toks)  # warm
        best = None
        for _ in range(2):
            c = shard_cache(init_kv_cache(config, batch, dtype=jnp.bfloat16), mesh)
            t0 = time.perf_counter()
            toks, _ = f(w, tok, c, pos)
            np.asarray(toks)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    short = max(steps // 4, 1)
    t_long = run(steps)
    t_short = run(short)
    per_step = (t_long - t_short) / (steps - short)
    if per_step <= 0:
        # Degenerate slope (contended host mesh): fall back to total/steps —
        # dispatch-inclusive, but always positive and monotone in the work.
        per_step = t_long / steps
    return batch / per_step


def scaling_report(
    config: ModelConfig,
    weights: Qwen3Weights,
    *,
    device_counts: Optional[Sequence[int]] = None,
    tp_per_group: int = 1,
    batch_per_dp: int = 1,
    steps: int = 32,
) -> dict:
    """Throughput at increasing device counts + efficiency vs 1 device.

    Efficiency(n) = throughput(n) / (n × throughput(1)) — the BASELINE.md
    scaling metric.  Runs on whatever devices are visible (pod slice or
    virtual CPU mesh).
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [c for c in (1, 2, 4, 8, len(devices)) if c <= len(devices)]
        device_counts = sorted(set(device_counts))

    results = {}
    for n in device_counts:
        tp = min(tp_per_group, n)
        tput = _throughput_on(
            config, weights, devices[:n], tp=tp, batch_per_dp=batch_per_dp, steps=steps
        )
        results[n] = tput
        logger.info("devices=%d → %.1f tok/s", n, tput)

    base = results[device_counts[0]] / device_counts[0]
    return {
        "throughput": results,
        "efficiency": {n: results[n] / (n * base) for n in device_counts},
    }
