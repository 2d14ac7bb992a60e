"""Prefill matmul microbench: dense-dequant path vs pre-dequantized bf16.

Separates the two candidate costs of the ~50% prefill MFU:
  (a) the dequantized-weights HBM round-trip (int8 read + bf16 write + read),
  (b) raw MXU efficiency of the bf16 contraction at prefill shapes.

Times an on-device ``lax.scan`` over stacked layers with a serial data
dependence (slope between two repeat counts cancels dispatch/transfer
latency — see bench.py).  Reports ms/sweep and achieved TFLOP/s.

Usage: python scripts/prefill_microbench.py [model] [rows]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.matmul import dequant_weights, qmatmul
from qwen3_rs_tpu.ops.quant import QuantizedTensor
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
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
    # Large arrays must be jit *arguments* — closing over them ships them in
    # the remote-compile payload (HTTP 413 through the axon relay).
    fns = {
        r: jax.jit(lambda *a, r=r: run(r, *a)) for r in (reps_lo, reps_hi)
    }
    for f in fns.values():
        np.asarray(f(*args))
    times = {}
    for r, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f(*args))
        times[r] = time.perf_counter() - t0
    return (times[reps_hi] - times[reps_lo]) / (reps_hi - reps_lo)


def bench(name, n, d):
    w = make(n, d)
    wf = jax.jit(jax.vmap(lambda t: dequant_weights(t, jnp.bfloat16)))(w)
    wf.block_until_ready()
    x = jnp.ones((rows, n), jnp.bfloat16)
    flops = 2.0 * rows * n * d * L

    def run_dequant(reps, x, w):
        def body(carry, i):
            xi = x + carry * 1e-30
            wl = QuantizedTensor(w.q[i % L], w.scales[i % L])
            return carry + jnp.sum(qmatmul(xi, wl, use_pallas=False)), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(reps * L, dtype=jnp.int32)
        )
        return out

    def run_bf16(reps, x, wf):
        def body(carry, i):
            xi = x + carry * 1e-30
            o = jax.lax.dot_general(
                xi,
                wf[i % L],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry + jnp.sum(o), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(reps * L, dtype=jnp.int32)
        )
        return out

    for label, run, args in (
        ("dequant+dot", run_dequant, (x, w)),
        ("bf16 dot", run_bf16, (x, wf)),
    ):
        per_sweep = slope_time(run, args)
        tflops = flops / per_sweep / 1e12
        print(
            f"{name:5s} [{rows}x{n:6d}->{d:6d}] {label:12s}: "
            f"{per_sweep * 1e3:7.3f} ms/sweep  {tflops:6.1f} TFLOP/s",
            flush=True,
        )


print(f"model={model} rows={rows}", flush=True)
for name, (n, d) in MATS.items():
    bench(name, n, d)
