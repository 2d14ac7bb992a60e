"""Same-process sweep of the dequant kernel's impl x tile variants at the
w13 prefill shape (the only one big enough to time reliably through the
relay).  Slope-timed like xla_dot_probe.py.

Usage: python scripts/dequant_sweep.py [n] [d]
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
from qwen3_rs_tpu.ops.quant import QuantizedTensor
from qwen3_rs_tpu.ops.pallas import qmatmul as qk

enable_compile_cache()

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
d = int(sys.argv[2]) if len(sys.argv) > 2 else 24576
G = 64
REPS = (16, 4)

rng = np.random.default_rng(0)
wq_d = jnp.asarray(rng.integers(-127, 128, size=(1, n, d), dtype=np.int8))
ws_d = jnp.asarray(rng.random((1, n // G, d), dtype=np.float32) * 0.01 + 0.001)
nbytes = n * d * 3.0  # 1B read + 2B write (scales negligible)


def make(impl, tiles, reps):
    @jax.jit
    def run(wq, ws):
        s = jnp.float32(0.0)
        for _ in range(reps):
            ws2 = ws + s * 1e-30
            s = s + jnp.sum(qk.dequant_pallas_stacked(
                QuantizedTensor(wq, ws2), jnp.zeros((), jnp.int32),
                impl=impl, tiles=tiles).astype(jnp.float32))
        return s
    return run


def slope(impl, tiles):
    times = {}
    for reps in REPS:
        f = make(impl, tiles, reps)
        np.asarray(f(wq_d, ws_d))
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(wq_d, ws_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[reps] = best
    return (times[REPS[0]] - times[REPS[1]]) / (REPS[0] - REPS[1])


print(f"n={n} d={d}  ({nbytes/1e6:.0f} MB moved/call)", flush=True)
for impl in ("f32", "bf16"):
    for tiles in ((512, 1024), (256, 2048), (1024, 1024), (512, 2048),
                  (2048, 512), (256, 1024)):
        tn, td = tiles
        if n % tn or d % td:
            continue
        try:
            t = slope(impl, tiles)
        except Exception as e:
            print(f"{impl:5} tiles={tiles}: FAILED {type(e).__name__}", flush=True)
            continue
        print(f"{impl:5} tiles={str(tiles):12} {t*1e3:8.3f} ms "
              f"{nbytes/t/1e9:7.1f} GB/s", flush=True)
