"""BENCH_MODE=scaling on a virtual CPU mesh (no TPU contention).

The deployment forces the axon TPU backend via sitecustomize, so env
vars alone can't select CPU; this wrapper flips the backend through
jax.config BEFORE first use (the tests/conftest.py trick), forces an
8-device host platform, and runs the same scaling_report that
BENCH_MODE=scaling uses — producing the round-dated scaling artifact
(honestly labeled contention-bound: 8 virtual devices share one host's
cores, so the efficiency numbers are a HARNESS-proof, not a hardware
claim; real multi-chip numbers remain environment-blocked).

Usage: python scripts/scaling_cpu_mesh.py [model] [devices]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_dev}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from qwen3_rs_tpu.models.qwen3 import cast_weight_scales  # noqa: E402
from qwen3_rs_tpu.parallel.distributed import scaling_report  # noqa: E402
from qwen3_rs_tpu.testing import qwen3_config, random_weights  # noqa: E402

model = sys.argv[1] if len(sys.argv) > 1 else "0.6b"
assert jax.devices()[0].platform == "cpu", jax.devices()
config = qwen3_config(model, seq_len=int(os.environ.get("SCALING_SEQ", "256")))
weights = cast_weight_scales(random_weights(config))
tp = int(os.environ.get("BENCH_TP", "1"))
report = scaling_report(config, weights, tp_per_group=tp, batch_per_dp=1)
counts = sorted(report["throughput"])
top = counts[-1]
print(
    json.dumps(
        {
            "metric": f"scaling_eff_qwen3_{model}_tp{tp}_cpu_mesh{n_dev}",
            "value": round(report["throughput"][top], 2),
            "unit": "tokens/sec",
            "vs_baseline": round(report["efficiency"][top], 4),
            "throughput": {str(k): round(v, 2) for k, v in report["throughput"].items()},
            "efficiency": {str(k): round(v, 4) for k, v in report["efficiency"].items()},
            "note": "virtual 8-device CPU mesh - contention-bound harness proof",
        }
    )
)
