"""A/B: W8A16 rows kernel vs W8A8 int8-MXU rows kernel at prefill shapes.

Decides whether on-the-fly activation quantization
(qmatmul_pallas_stacked_rows_a8 — int8×int8→int32 MXU dots, scales in the
f32 epilogue) beats the default bf16-dequant rows kernel
(qmatmul_pallas_stacked_rows) per matrix shape and row count.  The A8
kernel streams HALF the activation bytes and runs int8 MXU passes; the
W8A16 kernel skips the activation-quantization pass entirely.

Emits one JSON line per (matrix, rows, kernel) with ms/sweep and TFLOP/s;
the results drive the auto-selection table in models/qwen3.py
(_A8_PREFILL_WINS) and docs/kernels.md.

Usage: python scripts/prefill_a8_ab.py [model] [rows,rows,...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.pallas.qmatmul import (
    qmatmul_pallas_stacked_rows,
    qmatmul_pallas_stacked_rows_a8,
    rows_a8_supported,
    rows_supported,
)
from qwen3_rs_tpu.ops.quant import QuantizedTensor
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
row_list = [int(r) for r in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1024", "2048", "4096"])]
c = qwen3_config(model, seq_len=1024)
g = c.group_size

MATS = {
    "wqkv": (c.dim, c.all_heads_dim + 2 * c.kv_dim),
    "wo": (c.all_heads_dim, c.dim),
    "w13": (c.dim, 2 * c.hidden_dim),
    "w2": (c.hidden_dim, c.dim),
}

L = 4  # distinct weights per scan step so HBM traffic is real


def make(n, d):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def build():
        q = jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8)
        s = jnp.full((L, n // g, d), 0.01, jnp.bfloat16)
        return QuantizedTensor(q, s)

    w = build()
    jax.tree.map(lambda a: a.block_until_ready(), w)
    return w


def slope_time(run, args, reps_hi=12, reps_lo=3):
    fns = {r: jax.jit(lambda *a, r=r: run(r, *a)) for r in (reps_lo, reps_hi)}
    for f in fns.values():
        np.asarray(f(*args))
    times = {}
    for r, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f(*args))
        times[r] = time.perf_counter() - t0
    return (times[reps_hi] - times[reps_lo]) / (reps_hi - reps_lo)


def bench(name, n, d, rows):
    if not (rows_supported(n, d, g, rows) and rows_a8_supported(n, d, g, rows)):
        print(json.dumps({"matrix": name, "rows": rows, "skip": "unsupported"}))
        return
    w = make(n, d)
    x = jnp.ones((rows, n), jnp.bfloat16)
    flops = 2.0 * rows * n * d * L

    def run_w8a16(reps, x, w):
        def body(carry, i):
            xi = x + carry.astype(jnp.bfloat16) * 1e-30
            o = qmatmul_pallas_stacked_rows(xi, w, i % L)
            return carry + jnp.sum(o), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(reps * L, dtype=jnp.int32)
        )
        return out

    def run_w8a8(reps, x, w):
        def body(carry, i):
            xi = x + carry.astype(jnp.bfloat16) * 1e-30
            o = qmatmul_pallas_stacked_rows_a8(xi, w, i % L)
            return carry + jnp.sum(o), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(reps * L, dtype=jnp.int32)
        )
        return out

    for label, run in (("w8a16_rows", run_w8a16), ("w8a8_rows", run_w8a8)):
        per_sweep = slope_time(run, (x, w))
        print(
            json.dumps(
                {
                    "matrix": name,
                    "shape": [rows, n, d],
                    "kernel": label,
                    "ms_per_sweep": round(per_sweep * 1e3, 3),
                    "tflops": round(flops / per_sweep / 1e12, 1),
                }
            ),
            flush=True,
        )


print(f"model={model} rows={row_list}", flush=True)
for rows in row_list:
    for name, (n, d) in MATS.items():
        bench(name, n, d, rows)
