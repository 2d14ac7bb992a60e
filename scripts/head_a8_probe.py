"""Head-phase compute-path probe: can int8x int8 group dots beat the
dequant+bf16-dot idiom for the decode classifier GEMV?

EVIDENCE r4 §5: the megakernel head phase runs at 0.68 of its DMA share,
"bound by the dequant+dot serialization per tile".  The dequant is a VPU
pass over the whole [tn, td] weight tile; an int8 path needs NO weight
dequant — per 64-deep group: int8 dot (weights straight into the MXU),
then a 3-op f32 fixup on the [B, td] partial (conv, scale-row multiply,
accumulate).  VPU work drops ~5x (2 passes over [tn, td] vs 3·tg passes
over [B, td]); MXU passes go 1 -> tg (each 64-deep — the fixed per-pass
cost is the question this probe answers).

Arms (VMEM-resident tiles, no DMA — the compute path only, which is what
the phase's 0.68 deficit is made of):

  deq-dot   _dequant idiom + one bf16 dot           (current head phase)
  i8-seg    per-group int8 dot + f32 row fixup      (candidate)
  i8-seg2   like i8-seg but fixup folded to 2 ops   (pre-mult w-scale row)

Usage: python scripts/head_a8_probe.py [B] [tn] [td]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TN = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
TD = int(sys.argv[3]) if len(sys.argv) > 3 else 1536
G = 64
TG = TN // G
REPS = (32, 8)


def make_kernel(variant: str, n_tiles: int):
    """Loops over n_tiles VMEM-resident weight tiles (simulating the head
    phase's tile sweep without HBM DMAs)."""

    def kernel(x_ref, xq_ref, xs_ref, w_ref, s_ref, o_ref):
        def body(tt, _):
            t = jax.lax.rem(tt, w_ref.shape[0])
            if variant == "deq-dot":
                codes = w_ref[t]
                sc = jnp.broadcast_to(
                    s_ref[t][:, None, :].astype(jnp.bfloat16), (TG, G, TD)
                ).reshape(TN, TD)
                wf = codes.astype(jnp.bfloat16) * sc
                part = jax.lax.dot_general(
                    x_ref[:], wf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:] += part
            else:
                acc = jnp.zeros((B, TD), jnp.float32)
                for g in range(TG):
                    d = jax.lax.dot_general(
                        xq_ref[:, g * G : (g + 1) * G],
                        w_ref[t, g * G : (g + 1) * G, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # [B, TD] int32
                    if variant == "i8-seg":
                        # Real fixup: per-token x-scale column x w-scale row
                        # (static g => static slices, no dynamic gather).
                        acc += (
                            d.astype(jnp.float32)
                            * s_ref[t, g][None, :]
                            * xs_ref[:, g : g + 1]
                        )
                    else:  # i8-seg2: w-scale row only (x-scale pre-folded)
                        acc += d.astype(jnp.float32) * s_ref[t, g][None, :]
                o_ref[:] += acc
            return 0

        o_ref[:] = jnp.zeros_like(o_ref)
        jax.lax.fori_loop(0, n_tiles * 16, body, 0, unroll=False)

    return kernel


def build(variant: str, n_tiles: int, reps: int):
    def one(x, xq, xs, w, s):
        return jnp.sum(
            pl.pallas_call(
                make_kernel(variant, n_tiles),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, TD), jnp.float32),
            )(x, xq, xs, w, s)
        )

    @jax.jit
    def run(x, xq, xs, w, s):
        acc = jnp.float32(0.0)
        for _ in range(reps):
            # Perturb inputs EVERY arm actually reads (the int8 arms ignore
            # x — perturbing only x let XLA CSE their chained calls).
            eps = acc * 1e-30
            x2 = x + eps.astype(x.dtype)
            s2 = s + eps
            xs2 = xs + eps
            acc = acc + one(x2, xq, xs2, w, s2)
        return acc

    return run


def main():
    n_tiles = 2  # two resident tiles => some buffer variety, still in VMEM
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, TN)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 128, (B, TN)), jnp.int8)
    xs = jnp.asarray(rng.random((B, TG)) * 0.01 + 0.001, jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (n_tiles, TN, TD)), jnp.int8)
    s = jnp.asarray(rng.random((n_tiles, TG, TD)) * 0.01 + 0.001, jnp.float32)

    print(f"B={B} TN={TN} TD={TD} tiles={n_tiles} (compute path only)", flush=True)
    variants = ("deq-dot", "i8-seg", "i8-seg2")
    # Round-robin ALL (variant, reps) cells so every cell samples the same
    # relay-drift epochs — sequential arms measured 3x run-to-run swings.
    fns = {}
    for v in variants:
        for reps in REPS:
            fns[(v, reps)] = build(v, n_tiles, reps)
            np.asarray(fns[(v, reps)](x, xq, xs, w, s))  # compile + warm
    best = {k: None for k in fns}
    for _ in range(6):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x, xq, xs, w, s))
            dt = time.perf_counter() - t0
            best[k] = dt if best[k] is None else min(best[k], dt)
    for v in variants:
        t = (best[(v, REPS[0])] - best[(v, REPS[1])]) / (REPS[0] - REPS[1]) / (
            n_tiles * 16)
        gbs = (TN * TD) / t / 1e9  # int8 weight bytes per tile-time
        print(f"{v:10} {t*1e6:9.2f} us/tile  (weight-stream equiv "
              f"{gbs:7.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
