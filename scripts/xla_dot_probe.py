"""Prefill matmul ceiling probe: can XLA's native bf16 dot beat the
Pallas W8A16 rows kernel at prefill shapes?

EVIDENCE r4 §3 pinned the prefill gap (0.686 of MXU peak) on the rows
kernel's 115.7 TF/s matmul rate.  That rate folds dequantization into the
dot; XLA's own bf16 matmul emitters may sustain more at these shapes.  If
they do, a prefill path that dequantizes each layer's weights to bf16
(one bandwidth-bound pass, amortized over thousands of rows) and then
calls ``jnp.dot`` buys back the gap — prefill is compute-bound, so bf16's
2x weight bytes are free there.

Arms, per 8B layer shape (timed by the repo's slope methodology: chained
reps with a data dependence, device-side reduction, slope between two rep
counts to cancel relay RTT — see a8_depth_probe.py):

  xla-bf16      jnp.dot on pre-dequantized bf16 weights — the ceiling
  xla-fused     dequant + dot in one jit — XLA fuses (or not; measured)
  pallas-rows   the shipping W8A16 rows kernel (qmatmul_pallas_stacked_rows)
  dequant-pass  standalone int8->bf16 dequant write (the amortized cost)

Usage: python scripts/xla_dot_probe.py [rows]
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

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
G = 64

# 8B per-layer prefill matmuls (dim 4096, 32q/8kv heads x 128, ffn 12288).
SHAPES = [
    ("qkv", 4096, 6144),
    ("attn_out", 4096, 4096),
    ("w13", 4096, 24576),
    ("w2", 12288, 4096),
]

REPS = (16, 4)


def slope_time(make_run, *args):
    """min-of-3 at each rep count, slope between the two counts."""
    times = {}
    for reps in REPS:
        f = make_run(reps)
        np.asarray(f(*args))  # compile + warm
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[reps] = best
    return (times[REPS[0]] - times[REPS[1]]) / (REPS[0] - REPS[1])


def main():
    rng = np.random.default_rng(0)
    print(f"rows={rows}  (TF/s = 2*rows*n*d / t; peak 197)", flush=True)
    print(f"{'shape':10} {'arm':14} {'ms':>8} {'TF/s':>8} {'of197':>6}", flush=True)
    for name, n, d in SHAPES:
        wq_d = jnp.asarray(
            rng.integers(-127, 128, size=(1, n, d), dtype=np.int8))
        ws_d = jnp.asarray(
            rng.random((1, n // G, d), dtype=np.float32) * 0.01 + 0.001)
        x = jnp.asarray(rng.standard_normal((rows, n)), jnp.bfloat16)
        qt = QuantizedTensor(wq_d, ws_d)
        flops = 2.0 * rows * n * d

        def dequant_inner(wq, ws):
            w = wq[0].astype(jnp.float32).reshape(n // G, G, d)
            return (w * ws[0][:, None, :]).reshape(n, d).astype(jnp.bfloat16)

        w_bf16 = jax.jit(dequant_inner)(wq_d, ws_d)
        jax.block_until_ready(w_bf16)

        def chain(one, nargs):
            def make(reps):
                @jax.jit
                def run(*args):
                    s = jnp.float32(0.0)
                    for _ in range(reps):
                        # 1e-30 is representable but below bf16/f32 rounding
                        # at |x|~1: keeps the dep chain XLA-opaque (no CSE /
                        # loop-invariant hoisting) without perturbing values.
                        # EVERY arg is perturbed so per-call work (e.g. the
                        # fused dequant) cannot be hoisted out of the chain.
                        eps = s * 1e-30
                        aa = tuple(
                            a + eps.astype(a.dtype) if a.dtype != jnp.int8
                            else a for a in args)
                        s = s + one(*aa)
                    return s
                return run
            return make

        arms = []
        arms.append(("xla-bf16", chain(
            lambda x, w: jnp.sum(jnp.dot(
                x, w, preferred_element_type=jnp.float32)), 2), (x, w_bf16)))
        arms.append(("xla-fused", chain(
            lambda x, wq, ws: jnp.sum(jnp.dot(
                x, dequant_inner(wq, ws),
                preferred_element_type=jnp.float32)), 3), (x, wq_d, ws_d)))
        arms.append(("pallas-rows", chain(
            lambda x, qtq, qts: jnp.sum(qk.qmatmul_pallas_stacked_rows(
                x, QuantizedTensor(qtq, qts), jnp.zeros((), jnp.int32))), 3),
            (x, wq_d, ws_d)))
        arms.append(("deqkern+dot", chain(
            lambda x, qtq, qts: jnp.sum(jnp.dot(
                x, qk.dequant_pallas_stacked(
                    QuantizedTensor(qtq, qts), jnp.zeros((), jnp.int32)),
                preferred_element_type=jnp.float32)), 3), (x, wq_d, ws_d)))
        arms.append(("deqkern-pass", chain(
            lambda wq, ws: jnp.sum(qk.dequant_pallas_stacked(
                QuantizedTensor(wq, ws),
                jnp.zeros((), jnp.int32)).astype(jnp.float32)), 2),
            (wq_d, ws_d)))
        arms.append(("dequant-pass", chain(
            lambda wq, ws: jnp.sum(
                dequant_inner(wq, ws).astype(jnp.float32)), 2), (wq_d, ws_d)))

        for arm, make, args in arms:
            try:
                t = slope_time(make, *args)
            except Exception as e:  # pragma: no cover - probe robustness
                print(f"{name:10} {arm:14} FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            if arm.endswith("-pass"):
                gbs = (n * d * 3.0) / t / 1e9  # 1B read + 2B write
                print(f"{name:10} {arm:14} {t*1e3:8.3f} {gbs:8.1f} GB/s",
                      flush=True)
            else:
                tf = flops / t / 1e12
                print(f"{name:10} {arm:14} {t*1e3:8.3f} {tf:8.1f} "
                      f"{tf/197:6.3f}", flush=True)


if __name__ == "__main__":
    main()
