"""The W8A8-g64 roofline question, isolated: can depth-64-segmented int8
MXU dots beat one full-depth bf16 dot AT ALL on this chip?

Group quantization (g=64) forces the W8A8 contraction to segment at depth
64: per group, an int8×int8→int32 dot, then a per-group scale fixup
(sx_g · sw_gd).  The int8 MXU's nominal 2× only pays if a depth-64 dot
sustains more than half the full-depth rate — the v5e MXU is a 128×128
systolic array, so a 64-deep pass uses half its rows.

This probe times three pure-Pallas kernels at w13 prefill shapes, SAME
tile geometry, no scale work at all (the fixup can only make W8A8 slower
than what is measured here):

  bf16-full   — one bf16 dot over the whole tile depth (the W8A16 floor)
  i8-seg64    — tile depth split into 64-deep int8 dots, int32 accumulate
  i8-full     — one full-depth int8 dot (invalid numerics for g=64;
                the int8 MXU ceiling, for reference)

If i8-seg64 ≤ bf16-full, W8A8-g64 cannot win on v5e for any row count and
the question is closed (docs/kernels.md).

Usage: python scripts/a8_depth_probe.py [rows] [n] [d]
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

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
d = int(sys.argv[3]) if len(sys.argv) > 3 else 24576
G = 64
TILE_B, TILE_N, TILE_D = 256, 512, 1024


def make_kernel(variant: str):
    def kernel(x_ref, w_ref, o_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        if variant == "bf16-full":
            o_ref[:] += jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16),
                w_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif variant == "i8-full":
            o_ref[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:  # i8-seg64: the W8A8-g64 contraction structure
            acc = jnp.zeros((TILE_B, TILE_D), jnp.int32)
            for g in range(TILE_N // G):
                acc += jax.lax.dot_general(
                    x_ref[:, g * G : (g + 1) * G],
                    w_ref[g * G : (g + 1) * G, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            o_ref[:] += acc.astype(jnp.float32)

    return kernel


def build(variant: str, reps: int):
    in_dtype = jnp.bfloat16 if variant == "bf16-full" else jnp.int8

    def one(x, w):
        grid = (rows // TILE_B, d // TILE_D, n // TILE_N)
        out = pl.pallas_call(
            make_kernel(variant),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, TILE_N), lambda i, j, k: (i, k)),
                pl.BlockSpec((TILE_N, TILE_D), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((TILE_B, TILE_D), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x.astype(in_dtype), w.astype(in_dtype))
        # Reduce ON DEVICE: fetching the [rows, d] f32 output (192 MB)
        # through the relay would dominate the timing by ~1000x.
        return jnp.sum(out)

    @jax.jit
    def run(x, w):
        # Chain reps with a data dependence so XLA can't CSE/DCE them;
        # the caller takes the slope between two rep counts to cancel
        # dispatch + fetch RTT (~5 ms through the relay).
        s = jnp.float32(0.0)
        for _ in range(reps):
            s = s + one(x + s * 1e-30, w)
        return s

    return run


key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (rows, n), jnp.float32) * 3
wb = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32) * 3

flops = 2.0 * rows * n * d
print(f"rows={rows} n={n} d={d} tiles=({TILE_B},{TILE_N},{TILE_D}) "
      f"flops/call={flops / 1e9:.1f} GF", flush=True)

REPS = (8, 2)
for variant in ("bf16-full", "i8-seg64", "i8-full"):
    times = {}
    for reps in REPS:
        f = build(variant, reps)
        np.asarray(f(xb, wb))  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(xb, wb))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[reps] = best
    per = (times[REPS[0]] - times[REPS[1]]) / (REPS[0] - REPS[1])
    print(f"  {variant:>10}: {per * 1e3:7.2f} ms/call  {flops / per / 1e12:6.1f} TF/s",
          flush=True)
