"""Per-kernel HBM-bandwidth microbench for the qmatmul kernels at real
model shapes.  Times an on-device ``lax.scan`` over layers (slope between
two repeat counts cancels dispatch + transfer latency) and reports
effective GB/s per matrix.

Usage: python scripts/kernel_microbench.py [model] [scale_dtype]
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

from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked
from qwen3_rs_tpu.ops.quant import Q4Tensor, QuantizedTensor
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
scale_dtype = jnp.dtype(sys.argv[2]) if len(sys.argv) > 2 else jnp.float32
# MB_BITS=4 benches the nibble-packed INT4 kernel (bytes halve; the GB/s
# figure is effective bandwidth on the PACKED stream).
bits = int(__import__('os').environ.get('MB_BITS', 8))
c = qwen3_config(model, seq_len=1024)
g = c.group_size

MATS = {
    "wqkv": (c.dim, c.all_heads_dim + 2 * c.kv_dim),
    "wo": (c.all_heads_dim, c.dim),
    "w13": (c.dim, 2 * c.hidden_dim),
    "w2": (c.hidden_dim, c.dim),
}


def make(n, d, L):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def build():
        s = jnp.full((L, n // g, d), 0.01, scale_dtype)
        if bits == 4:
            return Q4Tensor(jax.random.bits(key, (L, n // 2, d), jnp.uint8), s)
        q = jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8)
        return QuantizedTensor(q, s)

    w = build()
    jax.tree.map(lambda a: a.block_until_ready(), w)
    return w


def bench(name, n, d, L=8, reps_hi=int(__import__('os').environ.get('MB_REPS', 24)), reps_lo=None):
    reps_lo = reps_lo or max(reps_hi // 4, 1)
    w = make(n, d, L)
    x = jnp.ones((1, n), jnp.float32)

    def run(reps):
        idxs = jnp.arange(reps * L, dtype=jnp.int32) % L

        def body(carry, idx):
            # Fold the carry into x: a serial data dependence so XLA cannot
            # CSE-merge unrolled iterations that share a layer index (which
            # would make repeats free and inflate the measured bandwidth).
            xi = x + carry * 1e-30
            return carry + jnp.sum(qmatmul_pallas_stacked(xi, w, idx)), None

        out, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return out

    fns = {r: jax.jit(lambda r=r: run(r)) for r in (reps_lo, reps_hi)}
    for f in fns.values():
        np.asarray(f())  # compile + warm
    times = {}
    for r, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f())
        times[r] = time.perf_counter() - t0
    per_sweep = (times[reps_hi] - times[reps_lo]) / (reps_hi - reps_lo)
    code_bytes = n * d // 2 if bits == 4 else n * d
    bytes_per_sweep = L * (code_bytes + (n // g) * d * jnp.dtype(scale_dtype).itemsize)
    gbs = bytes_per_sweep / per_sweep / 1e9
    print(f"{name:5s} [{n:6d},{d:6d}] x{L}: {per_sweep*1e3:7.3f} ms/sweep  {gbs:6.1f} GB/s")
    return gbs


print(f"model={model} scales={scale_dtype} bits={bits}", flush=True)
only = sys.argv[3] if len(sys.argv) > 3 else None
for name, (n, d) in MATS.items():
    if only and name != only:
        continue
    bench(name, n, d)
