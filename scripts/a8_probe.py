"""Empirical compile/speed probe for the W8A8 rows kernel tile space.

The Mosaic scoped-VMEM accounting for this kernel (unrolled per-group
int8 MXU dots + f32 scale fixup) defies the analytic estimate, so probe:
for each candidate (tile_b, tile_n, tile_d), compile + time the kernel at
8B w13 prefill shapes via explicit ``tiles=`` override, catching compile
OOMs.  Also times the W8A16 rows kernel as the line to beat.

Usage: python scripts/a8_probe.py [rows] [n] [d]
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

from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_rows
from qwen3_rs_tpu.ops.quant import QuantizedTensor, quantize_activations

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
d = int(sys.argv[3]) if len(sys.argv) > 3 else 24576
g = 64
L = 4

key = jax.random.PRNGKey(0)
wq = jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8)
ws = jnp.full((L, n // g, d), 0.01, jnp.float32)
x = jnp.ones((rows, n), jnp.bfloat16)
xq = quantize_activations(x.astype(jnp.float32), g)
flops = 2.0 * rows * n * d


def timeit(fn, *args, reps=8):
    o = fn(*args)
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    np.asarray(o)
    return (time.perf_counter() - t0) / reps


# Line to beat: the W8A16 rows kernel.
w_bf = QuantizedTensor(wq, ws.astype(jnp.bfloat16))
t16 = timeit(lambda: qmatmul_pallas_stacked_rows(x, w_bf, 1))
print(f"w8a16 rows: {t16 * 1e3:.3f} ms  {flops / t16 / 1e12:.1f} TFLOP/s", flush=True)

cands = []
for tb in (256, 512):
    if rows % tb:
        continue
    for tn in (512, 1024):
        if n % tn:
            continue
        for td in (512, 1024, 2048):
            if d % td:
                continue
            cands.append((tb, tn, td))

from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_rows_a8

for tiles in cands:
    try:
        t = timeit(
            lambda tiles=tiles: qmatmul_pallas_stacked_rows_a8(
                xq, QuantizedTensor(wq, ws), 1, tiles=tiles
            )
        )
        print(
            f"a8 tiles={tiles}: {t * 1e3:.3f} ms  {flops / t / 1e12:.1f} TFLOP/s",
            flush=True,
        )
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"a8 tiles={tiles}: FAIL {msg}", flush=True)
