"""Multi-process runtime: ``initialize_distributed`` across 2 real OS
processes (CPU backend) — the jax.distributed path BASELINE config 5's
model-parallel-over-DCN shape relies on (VERDICT r1: previously never
exercised anywhere)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from qwen3_rs_tpu.parallel.distributed import initialize_distributed

pid = int(sys.argv[1])
initialize_distributed(sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

import jax.numpy as jnp
from jax.experimental import multihost_utils

# Cross-process collective: every process sees both contributions.
got = multihost_utils.process_allgather(jnp.asarray([pid + 1], jnp.int32))
assert sorted(got.ravel().tolist()) == [1, 2], got
print(f"proc {pid} OK", flush=True)
"""


TP_FORWARD_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from qwen3_rs_tpu.parallel.distributed import initialize_distributed

pid = int(sys.argv[1])
initialize_distributed(sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from test_model_parity import make_weights
from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
from qwen3_rs_tpu.parallel.mesh import TP_AXIS
from qwen3_rs_tpu.parallel.sharding import weight_pspecs
from qwen3_rs_tpu.parallel.tp import interleave_for_tp, make_tp_forward

CONFIG = ModelConfig(
    architecture_id=ARCHITECTURE_QWEN3,
    dim=64, hidden_dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
    head_dim=16, seq_len=64, vocab_size=96, group_size=16,
    shared_classifier=True,
)

# Deterministic seed: both processes build byte-identical global weights.
rng = np.random.default_rng(42)
_, weights = make_weights(CONFIG, rng)
tokens = np.asarray([[5, 9, 3]], np.int32)
pos = np.zeros(1, np.int32)

# Single-device reference, computed locally on each process.
ref_logits, ref_cache = qwen3_forward(
    CONFIG, weights, jnp.asarray(tokens), init_kv_cache(CONFIG, batch=1),
    jnp.asarray(pos), mode="fast",
)
ref = np.asarray(ref_logits)
ref_ck = float(jnp.sum(jnp.abs(ref_cache.k)) + jnp.sum(jnp.abs(ref_cache.v)))

# Global mesh over BOTH processes' devices (1 local CPU device each):
# the tp axis spans the process boundary, so every psum/collective in the
# shard_map forward crosses it.
mesh = Mesh(np.asarray(jax.devices()).reshape(2), (TP_AXIS,))
repl = NamedSharding(mesh, P())


def put(arr, spec):
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


inter = interleave_for_tp(weights, CONFIG, 2)
specs = jax.tree_util.tree_unflatten(
    jax.tree_util.tree_structure(inter),
    jax.tree_util.tree_leaves(weight_pspecs(CONFIG)),
)
w_g = jax.tree.map(put, inter, specs)
cache_spec = P(None, None, TP_AXIS, None, None)
c_g = jax.tree.map(lambda leaf: put(leaf, cache_spec), init_kv_cache(CONFIG, batch=1))

fwd = make_tp_forward(CONFIG, mesh)
logits, new_cache = fwd(w_g, put(tokens, P()), c_g, put(pos, P()))

# Replicate outputs so each process holds the full values.
got = np.asarray(
    jax.jit(lambda x: x, out_shardings=repl)(logits).addressable_data(0)
)
got_ck = float(
    jax.jit(
        lambda c: jnp.sum(jnp.abs(c.k)) + jnp.sum(jnp.abs(c.v)),
        out_shardings=repl,
    )(new_cache).addressable_data(0)
)

np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
assert abs(got_ck - ref_ck) <= 2e-3 * max(1.0, abs(ref_ck)), (got_ck, ref_ck)
print(f"proc {pid} OK", flush=True)
"""


def _run_two_procs(worker: str):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{REPO / 'tests'}:{env.get('PYTHONPATH', '')}"
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(i), coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_two_process_initialize_and_allgather():
    _run_two_procs(WORKER)


def test_two_process_tp_forward():
    """The shard_map tensor-parallel forward runs across 2 OS processes
    (tp axis spanning the process boundary — the DCN model-parallel shape
    docs/serving.md promises) and matches the single-device forward."""
    _run_two_procs(TP_FORWARD_WORKER)
