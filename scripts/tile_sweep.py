"""Per-shape tile sweep for the stacked qmatmul kernel.

The tile picker's static heuristic (maximize block size under a VMEM
budget) turned out wrong on v5e: wo [4096,4096] streams at 646 GB/s with
the picked (512, 4096) tile but 791 GB/s with (512, 2048) — deeper grids
pipeline the DMA better once the per-block fixed cost is sub-µs.  This
script measures real bandwidth per (tile_n, tile_d) candidate per matrix
shape so the picker can carry a measured table instead of a guess.

Timing: slope between two scan lengths over a stacked L=8 weight set
(cancels dispatch + RTT), min of REPEAT passes (the TPU relay is noisy).

Usage: python scripts/tile_sweep.py [model] [mat ...]
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

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.pallas.qmatmul import _pick_tiles, qmatmul_pallas_stacked
from qwen3_rs_tpu.ops.quant import QuantizedTensor
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
mats_only = sys.argv[2:] or None
c = qwen3_config(model, seq_len=1024)
g = c.group_size
L = 8
REPEAT = int(os.environ.get("TS_REPEAT", "5"))
REPS_HI = int(os.environ.get("TS_REPS", "96"))
BATCH = int(os.environ.get("TS_BATCH", "1"))

MATS = {
    "wqkv": (c.dim, c.all_heads_dim + 2 * c.kv_dim),
    "wo": (c.all_heads_dim, c.dim),
    "w13": (c.dim, 2 * c.hidden_dim),
    "w2": (c.hidden_dim, c.dim),
}


def candidates(n: int, d: int) -> list[tuple[int, int]]:
    """Divisor tile pairs: groups%8==0 (scales sublane rule), codes 0.5-3.3 MB,
    >=4 blocks (pipeline depth)."""
    tns = [
        t
        for t in range(g, min(n, 8192) + 1, g)
        if n % t == 0 and ((t // g) % 8 == 0 or t == n)
    ]
    tds = [t for t in range(256, min(d, 8192) + 1, 256) if d % t == 0]
    out = {}
    for tn in tns:
        if tn > 2048:
            continue
        for td in tds:
            bytes_ = tn * td
            blocks = (n // tn) * (d // td)
            if not (0.4e6 <= bytes_ <= 3.4e6 and blocks >= 4):
                continue
            # One candidate per (tn, ~half-MB) bucket bounds the sweep size.
            out.setdefault((tn, round(bytes_ / 5e5)), (tn, td))
    return sorted(out.values())


def make_weights(n, d):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def build():
        return QuantizedTensor(
            jax.random.bits(key, (L, n, d), jnp.uint8).astype(jnp.int8),
            jnp.full((L, n // g, d), 0.01, jnp.bfloat16),
        )

    w = build()
    jax.tree.map(lambda a: a.block_until_ready(), w)
    return w


def bench_tiles(w, n, d, tiles) -> float:
    # Weights/x are jit ARGUMENTS (closure capture turns them into embedded
    # constants and produces nonsense timings through the relay).
    def run(w, x, reps):
        idxs = jnp.arange(reps * L, dtype=jnp.int32) % L

        def body(carry, idx):
            xi = x + carry * 1e-30
            return (
                carry + jnp.sum(qmatmul_pallas_stacked(xi, w, idx, tiles=tiles)),
                None,
            )

        out, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return out

    x = jnp.ones((BATCH, n), jnp.float32)
    lo = max(REPS_HI // 4, 1)
    fns = {
        r: jax.jit(functools.partial(run, reps=r)) for r in (lo, REPS_HI)
    }
    for f in fns.values():
        np.asarray(f(w, x))
    best = None
    for _ in range(REPEAT):
        times = {}
        for r, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(w, x))
            times[r] = time.perf_counter() - t0
        per = (times[REPS_HI] - times[lo]) / (REPS_HI - lo)
        best = per if best is None else min(best, per)
    bytes_per_sweep = L * (n * d + (n // g) * d * 2)
    return bytes_per_sweep / best / 1e9


for name, (n, d) in MATS.items():
    if mats_only and name not in mats_only:
        continue
    w = make_weights(n, d)
    picked = _pick_tiles(n, d, g, BATCH)
    results = []
    for tiles in candidates(n, d):
        try:
            gbs = bench_tiles(w, n, d, tiles)
        except Exception as e:  # noqa: BLE001 — skip uncompilable tiles
            print(f"  {name} {tiles}: FAIL {type(e).__name__}", flush=True)
            continue
        tag = " <== current pick" if tiles == picked else ""
        blocks = (n // tiles[0]) * (d // tiles[1])
        print(f"  {name} tn={tiles[0]:5d} td={tiles[1]:5d} blocks={blocks:4d}: "
              f"{gbs:6.1f} GB/s{tag}", flush=True)
        results.append((gbs, tiles))
    if results:
        best = max(results)
        print(f"{name} [{n},{d}] BEST: {best[1]} at {best[0]:.1f} GB/s", flush=True)
    del w
