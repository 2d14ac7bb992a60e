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


def test_two_process_initialize_and_allgather():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), coord],
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
