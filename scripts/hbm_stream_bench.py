"""Ground-truth achievable HBM read bandwidth on this chip.

A trivial Pallas kernel whose grid pipeline streams a large int8 array
block-by-block into VMEM and consumes one element per block — pure DMA,
no compute.  This is the physical ceiling the qmatmul kernels chase; the
roofline in bench.py uses the NOMINAL 819 GB/s, so the ratio printed here
bounds the best possible ``vs_baseline``.

Usage: python scripts/hbm_stream_bench.py [GB] [block_mb ...]
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

total_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
block_mbs = [float(a) for a in sys.argv[2:]] or [0.5, 1.0, 2.0, 4.0]
REPEAT = int(os.environ.get("HB_REPEAT", "5"))

LANES = 8192  # int8 row bytes


def bench(block_mb: float) -> float:
    rows = int(block_mb * 1e6) // LANES
    rows = max(8, rows - rows % 8)
    n_blocks = int(total_gb * 1e9 / (rows * LANES))
    arr_rows = n_blocks * rows

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[0, 0] = jnp.float32(0)

        # int8 scalar extracts are unsupported — consume a tiny 2D slice.
        o_ref[0, 0] += jnp.sum(x_ref[0:8, 0:128].astype(jnp.float32))

    def make(passes):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(passes * n_blocks,),
                in_specs=[
                    pl.BlockSpec(
                        (rows, LANES),
                        lambda i: (jax.lax.rem(i, n_blocks), 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(x)

        return run

    # Slope between 3-pass and 1-pass sweeps cancels dispatch + RTT.
    x = jnp.ones((arr_rows, LANES), jnp.int8)
    x.block_until_ready()
    fns = {p: make(p) for p in (1, 3)}
    for f in fns.values():
        np.asarray(f(x))  # compile + warm
    best = None
    for _ in range(REPEAT):
        times = {}
        for p, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            times[p] = time.perf_counter() - t0
        per_pass = (times[3] - times[1]) / 2
        best = per_pass if best is None else min(best, per_pass)
    gbs = arr_rows * LANES / best / 1e9
    print(
        f"block={block_mb:4.1f} MB rows={rows:5d} n_blocks={n_blocks:5d}: "
        f"{gbs:6.1f} GB/s  ({gbs / 819:.3f} of nominal v5e)",
        flush=True,
    )
    return gbs


for mb in block_mbs:
    bench(mb)
