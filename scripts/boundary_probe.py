"""Isolate the pallas_call boundary cost (launch + pipeline fill/drain).

Streams the SAME weight bytes two ways:
  percall — lax.scan over L layers, one pallas_call per layer (the decode
            path's shape today)
  onecall — a single pallas_call whose grid has a leading layer axis

The per-byte difference is what a layer megakernel (or multi-layer grid)
would recover.  Output math is deliberately ignored (the onecall variant
re-accumulates into one block); only bytes/time matter here.

Usage: python scripts/boundary_probe.py [model] [mat]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.pallas.qmatmul import (
    _VMEM_LIMIT_BYTES,
    _kernel_stacked,
    _pick_tiles,
    qmatmul_pallas_stacked,
)
from qwen3_rs_tpu.ops.quant import QuantizedTensor
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
mat = sys.argv[2] if len(sys.argv) > 2 else "w13"
c = qwen3_config(model, seq_len=1024)
g = c.group_size
L = 8
REPS_HI = int(os.environ.get("BP_REPS", "48"))
REPEAT = int(os.environ.get("BP_REPEAT", "5"))

MATS = {
    "wqkv": (c.dim, c.all_heads_dim + 2 * c.kv_dim),
    "wo": (c.all_heads_dim, c.dim),
    "w13": (c.dim, 2 * c.hidden_dim),
    "w2": (c.hidden_dim, c.dim),
}
n, d = MATS[mat]

key = jax.random.PRNGKey(0)
w = QuantizedTensor(
    jax.device_put(np.random.default_rng(0).integers(-127, 127, (L, n, d), np.int8)),
    jnp.full((L, n // g, d), 0.01, jnp.bfloat16),
)
jax.tree.map(lambda a: a.block_until_ready(), w)
x = jnp.ones((1, n), jnp.float32)

tiles = _pick_tiles(n, d, g, 1)
tile_n, tile_d = tiles
tile_groups = tile_n // g


def onecall(x, wq, ws, layers):
    """One pallas_call, grid (layers, d//tile_d, n//tile_n)."""
    b = x.shape[0]
    kernel = functools.partial(
        _kernel_stacked, group_size=g, tile_groups=tile_groups, impl="scale_w"
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(layers, d // tile_d, n // tile_n),
        in_specs=[
            pl.BlockSpec((b, tile_n), lambda l, i, k, s: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, tile_d),
                lambda l, i, k, s: (jax.lax.rem(l, jnp.int32(L)), k, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_groups, tile_d),
                lambda l, i, k, s: (jax.lax.rem(l, jnp.int32(L)), k, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, tile_d), lambda l, i, k, s: (0, i), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(jnp.zeros((1,), jnp.int32), x, wq, ws)


def make_onecall(reps):
    @jax.jit
    def run(w, x):
        out = onecall(x, w.q, w.scales, reps * L)
        return jnp.sum(out)

    return run


def make_percall(reps):
    @jax.jit
    def run(w, x):
        idxs = jnp.arange(reps * L, dtype=jnp.int32) % L

        def body(carry, idx):
            xi = x + carry * 1e-30
            return carry + jnp.sum(qmatmul_pallas_stacked(xi, w, idx)), None

        out, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return out

    return run


bytes_per_sweep = L * (n * d + (n // g) * d * 2)
lo = max(REPS_HI // 4, 1)
for name, maker in (("percall", make_percall), ("onecall", make_onecall)):
    fns = {r: maker(r) for r in (lo, REPS_HI)}
    for f in fns.values():
        np.asarray(f(w, x))
    best = None
    for _ in range(REPEAT):
        t = {}
        for r, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(w, x))
            t[r] = time.perf_counter() - t0
        per = (t[REPS_HI] - t[lo]) / (REPS_HI - lo)
        best = per if best is None else min(best, per)
    gbs = bytes_per_sweep / best / 1e9
    print(f"{mat} {name}: {best * 1e3 / L:7.4f} ms/layer  {gbs:6.1f} GB/s", flush=True)
