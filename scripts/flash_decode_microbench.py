"""Flash decode kernel vs XLA bounded attention, standalone A/B.

Times an on-device ``lax.scan`` over layers of JUST the decode attention op
(slope between two repeat counts cancels dispatch + RTT) for both paths at
several (window, position) points, at real model head shapes.

Usage: python scripts/flash_decode_microbench.py [model] [T,T,...]
Env:   FB_BATCH (default 1), FB_REPS (default 384), FB_INT8 (int8 KV cache)
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

from qwen3_rs_tpu.ops.attention import gqa_attention_split
from qwen3_rs_tpu.ops.pallas.flash_attention import flash_gqa_decode_stacked
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
windows = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [])] or [
    1024,
    4096,
    16384,
]
batch = int(os.environ.get("FB_BATCH", "1"))
reps_hi = int(os.environ.get("FB_REPS", "384"))
reps_lo = max(reps_hi // 4, 1)
int8_kv = os.environ.get("FB_INT8", "0") == "1"

c = qwen3_config(model)
L = 4
n_kv, n_heads, hd = c.n_kv_heads, c.n_heads, c.head_dim

key = jax.random.PRNGKey(0)


def make_cache(t):
    @jax.jit
    def build():
        if int8_kv:
            k = jax.random.bits(key, (L, batch, n_kv, t, hd), jnp.uint8).astype(jnp.int8)
            v = jax.random.bits(key, (L, batch, n_kv, t, hd), jnp.uint8).astype(jnp.int8)
            ks = jax.random.uniform(key, (L, batch, n_kv, t), jnp.float32, 0.005, 0.02)
            vs = jax.random.uniform(key, (L, batch, n_kv, t), jnp.float32, 0.005, 0.02)
            return k, v, ks, vs
        k = jax.random.normal(key, (L, batch, n_kv, t, hd), jnp.bfloat16)
        v = jax.random.normal(key, (L, batch, n_kv, t, hd), jnp.bfloat16)
        return k, v, jnp.zeros((0,)), jnp.zeros((0,))

    out = build()
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return out


@functools.partial(jax.jit, static_argnames=("reps",))
def flash_chain(q, kn, vn, k_all, v_all, ks, vs, pos, *, reps):
    kw = {}
    if ks.size:
        kw = dict(k_scale_all=ks, v_scale_all=vs)

    def body(carry, idx):
        qi = q + carry * 1e-30
        out = flash_gqa_decode_stacked(qi, kn, vn, k_all, v_all, pos, idx, **kw)
        return carry + jnp.sum(out), None

    out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps, dtype=jnp.int32) % L)
    return out


@functools.partial(jax.jit, static_argnames=("reps",))
def xla_chain(q, kn, vn, k_all, v_all, ks, vs, pos, *, reps):
    def body(carry, idx):
        qi = (q + carry * 1e-30)[:, None]
        kc = jax.lax.dynamic_index_in_dim(k_all, idx, 0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False)
        kw = {}
        if ks.size:
            kw = dict(
                k_scale_cache=jax.lax.dynamic_index_in_dim(ks, idx, 0, keepdims=False),
                v_scale_cache=jax.lax.dynamic_index_in_dim(vs, idx, 0, keepdims=False),
            )
        out = gqa_attention_split(
            qi, kc, vc, kn[:, None], vn[:, None], pos[:, None], pos, **kw
        )
        return carry + jnp.sum(out), None

    out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps, dtype=jnp.int32) % L)
    return out


def slope(fn, args):
    times = {}
    for reps in (reps_lo, reps_hi):
        np.asarray(fn(*args, reps=reps))
        t0 = time.perf_counter()
        np.asarray(fn(*args, reps=reps))
        times[reps] = time.perf_counter() - t0
    return (times[reps_hi] - times[reps_lo]) / (reps_hi - reps_lo)


HBM_BW = 819e9

for t in windows:
    k_all, v_all, ks, vs = make_cache(t)
    pos = jnp.full((batch,), t - 64, jnp.int32)
    q = jax.random.normal(key, (batch, n_heads, hd), jnp.float32)
    kn = jax.random.normal(key, (batch, n_kv, hd), jnp.float32)
    vn = jax.random.normal(key, (batch, n_kv, hd), jnp.float32)
    args = (q, kn, vn, k_all, v_all, ks, vs, pos)

    per_flash = slope(flash_chain, args)
    per_xla = slope(xla_chain, args)
    bytes_kv = 2 * n_kv * int(pos[0]) * hd * (1 if int8_kv else 2) * batch
    sol = bytes_kv / HBM_BW
    print(
        f"T={t:6d} pos={int(pos[0]):6d} b={batch}  "
        f"flash {per_flash * 1e6:8.1f} us  xla {per_xla * 1e6:8.1f} us  "
        f"speedup {per_xla / per_flash:5.2f}x  sol {sol * 1e6:7.1f} us  "
        f"flash-frac-sol {sol / per_flash:.2f}",
        flush=True,
    )
