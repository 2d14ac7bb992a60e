"""Calibrate rows-kernel tile sizes on the real chip: try candidate
(tile_b, tile_n, tile_d) combos on the 8B w13 shape at a given row count,
report compile success + slope-timed ms/sweep.

Usage: PYTHONPATH=... python scripts/rows_tile_calibrate.py [rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.pallas.qmatmul import _qmatmul_stacked_rows_2d
from qwen3_rs_tpu.testing import qwen3_config

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
c = qwen3_config("8b", seq_len=1024)
g = c.group_size
n, d = c.dim, 2 * c.hidden_dim  # w13: the biggest matrix
L = 4

key = jax.random.PRNGKey(0)
wq = jax.jit(lambda: jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8))()
ws = jnp.full((L, n // g, d), 0.01, jnp.float32)
wq.block_until_ready()

CANDIDATES = [
    (512, 1024, 2048),
    (512, 1024, 3072),
    (512, 2048, 1024),
    (512, 2048, 1536),
    (256, 2048, 2048),
    (1024, 1024, 1024),
    # The production pick at 4096 rows (r4 calibration).
    (512, 1024, 1536),
    # Weight-stationary candidates (r5, VERDICT item 5): bigger row blocks
    # halve/quarter the weight re-streaming (8× at s=4096 with tb=512) at
    # the cost of smaller weight tiles under the ~23 MB scoped-VMEM
    # frontier — the A/B that decides whether the rows kernel is
    # weight-stream-bound or MXU-tile-bound.
    (1024, 1024, 512),
    (1024, 512, 1024),
    (1024, 512, 1536),
    (2048, 512, 512),
    (2048, 1024, 256),
    (4096, 512, 256),
]
env_c = os.environ.get("ROWS_CANDIDATES")
if env_c:
    CANDIDATES = [tuple(int(v) for v in spec.split("x")) for spec in env_c.split(",")]


def bench(tiles):
    x = jnp.ones((rows, n), jnp.bfloat16)

    def run(reps, x, wq, ws):
        def body(carry, i):
            xi = x + carry.astype(jnp.bfloat16) * 1e-30
            out = _qmatmul_stacked_rows_2d(xi, wq, ws, i % L, tiles=tiles)
            return carry + jnp.sum(out), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps * L, dtype=jnp.int32))
        return out

    fns = {r: jax.jit(lambda x, wq, ws, r=r: run(r, x, wq, ws)) for r in (2, 6)}
    for f in fns.values():
        np.asarray(f(x, wq, ws))
    times = {}
    for r, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f(x, wq, ws))
        times[r] = time.perf_counter() - t0
    per_sweep = (times[6] - times[2]) / 4
    flops = 2.0 * rows * n * d * L
    return per_sweep * 1e3, flops / per_sweep / 1e12


for tiles in CANDIDATES:
    tb, tn, td = tiles
    if rows % tb or n % tn or d % td:
        continue
    try:
        ms, tf = bench(tiles)
        print(f"tiles tb={tb:5d} tn={tn:5d} td={td:5d}: {ms:8.3f} ms/sweep {tf:6.1f} TFLOP/s", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        print(f"tiles tb={tb:5d} tn={tn:5d} td={td:5d}: FAIL {msg}", flush=True)
