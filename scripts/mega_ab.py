"""Same-process A/B for megakernel variants (cancels relay drift).

Each variant is traced under its env setting (dispatch reads env at trace
time), then the timed runs INTERLEAVE variants A/B/A/B so slow drift in
the relay/device clock hits both equally.  Reports ms/step per variant
via the slope method.

Usage:
  python scripts/mega_ab.py 8b  attn_prefetch     # wo/w13 pre-start on/off
  python scripts/mega_ab.py 8b  q4tiles 2097152,1048576,524288
  python scripts/mega_ab.py 0.6b attn_prefetch
  python scripts/mega_ab.py 8b  env QWEN3_TPU_MEGA_UNROLL 1,4
  python scripts/mega_ab.py 8b  multi A=1:B=2,A=0:B=4   # combined knobs
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

from qwen3_rs_tpu.models.qwen3 import (
    cast_weight_scales,
    init_kv_cache,
    qwen3_forward,
)
from qwen3_rs_tpu.testing import (
    qwen3_config,
    random_weights,
    weight_bytes_per_decode_token,
)

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
what = sys.argv[2] if len(sys.argv) > 2 else "attn_prefetch"
arg3 = sys.argv[3] if len(sys.argv) > 3 else ""

SEQ = 1024
STEPS = (48, 12)
config = qwen3_config(model, seq_len=SEQ)

if what == "q4tiles":
    bits = 4
    os.environ["QWEN3_TPU_MEGA_Q4"] = "1"  # A/B the (default-off) Q4 megakernel
    elems = [int(v) for v in (arg3.split(",") if arg3 else ["2097152", "1048576", "524288"])]
    variants = [("QWEN3_TPU_MEGA_Q4_ELEMS", str(e), f"q4elems={e}") for e in elems]
    variants.append(("QWEN3_TPU_DISABLE_MEGAKERNEL", "1", "q4 per-matrix path"))
elif what in ("env", "q4env"):
    # Generic sweep: mega_ab.py <model> env <ENV_VAR> v1,v2,...
    # (q4env: same with INT4 linear weights — e.g. the Q4 unpack variants)
    bits = 4 if what == "q4env" else 8
    key = arg3
    vals = sys.argv[4].split(",")
    variants = [(key, v, f"{key.split('_')[-2:]}={v}") for v in vals]
elif what in ("multi", "q4multi"):
    # Combined-knob sweep: mega_ab.py <model> multi K1=V1:K2=V2,K1=V1b:...
    # Each comma-separated variant is a colon-separated list of KEY=VAL
    # env settings applied together for that arm.
    bits = 4 if what == "q4multi" else 8
    variants = []
    for spec in arg3.split(","):
        pairs = [kv.split("=", 1) for kv in spec.split(":")]
        # Labels must be UNIQUE — they key the fns dict, and a collision
        # would silently compare an arm against itself (the exact failure
        # mode the static-tuning rework fixed).  Strip only the common
        # prefix; keep the rest of the key.
        label = " ".join(
            f"{k.removeprefix('QWEN3_TPU_').removeprefix('MEGA_')}={v}"
            for k, v in pairs
        )
        variants.append((dict(pairs), None, label))
    if len({label for _, _, label in variants}) != len(variants):
        raise SystemExit(f"duplicate variant labels: {[v[2] for v in variants]}")
else:
    bits = 8
    variants = [
        ("QWEN3_TPU_MEGA_ATTN_PREFETCH", "1", "attn prefetch ON"),
        ("QWEN3_TPU_MEGA_ATTN_PREFETCH", "0", "attn prefetch OFF"),
    ]

weights = cast_weight_scales(random_weights(config, bits=bits))
roofline_ms = (
    weight_bytes_per_decode_token(config, scale_bytes=2, bits=bits) / 819e9 * 1e3
)


def make_fn(env_key, env_val, n_steps):
    overrides = env_key if isinstance(env_key, dict) else {env_key: env_val}
    olds = {k: os.environ.get(k) for k in overrides}
    os.environ.update(overrides)
    try:

        def decode_n(w, token, cache, pos):
            def body(carry, _):
                token, cache, pos = carry
                logits, cache = qwen3_forward(
                    config, w, token, cache, pos, mode="fast"
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return (nxt, cache, pos + 1), nxt

            carry, toks = jax.lax.scan(body, (token, cache, pos), None, length=n_steps)
            # Return the cache so the donated input buffer is actually
            # reusable — without a matching output, donation silently
            # fails and every timed call allocates a fresh cache.  At 8B
            # (1.2 GB/cache × 6 compiled fns on a 16 GB chip next to
            # 9.3 GB of weights) the leak oversubscribed HBM and the
            # device fell to ~4% throughput for the whole sweep.
            return toks, carry[1]

        f = jax.jit(decode_n, donate_argnums=(2,))
        cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
        tok = jnp.ones((1, 1), jnp.int32)
        pos = jnp.zeros((1,), jnp.int32)
        np.asarray(f(weights, tok, cache, pos)[0])  # compile + warm
        return f
    finally:
        for k, old in olds.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old


fns = {}
for key, val, label in variants:
    # Each variant must reach the megakernel as a DISTINCT inner-jit
    # cache key: decode_stack_megakernel is itself jitted and its jaxpr
    # is cached by (avals, statics), so env vars read inside it are
    # frozen at the first trace.  The dispatch (models/qwen3.py) reads
    # the tuning env per OUTER trace and threads it as the static
    # ``tuning`` argument, which is what makes this loop's per-variant
    # env toggling actually produce different kernels.  (Caught by
    # review: before that plumbing, these "A/Bs" compared the first
    # variant against itself.)
    fns[label] = {n: make_fn(key, val, n) for n in STEPS}
    print(f"compiled: {label}", flush=True)

REPS = 3
times = {label: {n: [] for n in STEPS} for label in fns}
for _ in range(REPS):
    for n in STEPS:
        for label, by_n in fns.items():
            cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
            tok = jnp.ones((1, 1), jnp.int32)
            pos = jnp.zeros((1,), jnp.int32)
            t0 = time.perf_counter()
            np.asarray(by_n[n](weights, tok, cache, pos)[0])
            times[label][n].append(time.perf_counter() - t0)

print(f"model={model} bits={bits} roofline={roofline_ms:.3f} ms/step")
for label in times:
    t_long = min(times[label][STEPS[0]])
    t_short = min(times[label][STEPS[1]])
    per = (t_long - t_short) / (STEPS[0] - STEPS[1])
    print(
        f"  {label:>22}: {per * 1e3:7.3f} ms/step "
        f"({1.0 / per:7.1f} tok/s, frac={roofline_ms / (per * 1e3):.4f})",
        flush=True,
    )
