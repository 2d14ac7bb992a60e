"""Paged decode attention microbench: Pallas kernel vs XLA page-gather.

Times one decode step's attention across all layers (on-device
``lax.scan`` over the layer index; slope between two repeat counts cancels
dispatch + transfer latency, see kernel_microbench.py) for both paths:

* ``xla``    — ``gqa_attention_split_paged`` (gathers each touched page
  into an f32 copy, the serving fallback path);
* ``pallas`` — ``paged_gqa_decode_stacked`` (page table in SMEM, pages
  DMA'd pool→VMEM, ops/pallas/paged_attention.py).

Usage: python scripts/paged_attn_microbench.py [model] [xla|pallas|both]
Env:   PB_BATCH (default 8), PB_POS (default 1024), PB_INT8=1 (int8 pool),
       PB_REPS (default 16), PB_S (default 1: fused decode kernel; >1:
       window partials kernel vs XLA, speculative-verify shapes).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

from qwen3_rs_tpu.ops.attention import gqa_attention_split_paged
from qwen3_rs_tpu.ops.pallas.paged_attention import (
    paged_gqa_decode_stacked,
    paged_gqa_window_stacked,
)
from qwen3_rs_tpu.testing import qwen3_config

model = sys.argv[1] if len(sys.argv) > 1 else "8b"
which = sys.argv[2] if len(sys.argv) > 2 else "both"
B = int(os.environ.get("PB_BATCH", 8))
POS = int(os.environ.get("PB_POS", 1024))
INT8 = os.environ.get("PB_INT8", "0") == "1"
REPS = int(os.environ.get("PB_REPS", 16))
S = int(os.environ.get("PB_S", 1))
PAGE = 128

c = qwen3_config(model, seq_len=4096)
L, n_kv, n_heads, hd = c.n_layers, c.n_kv_heads, c.n_heads, c.head_dim
max_pages = -(-c.seq_len // PAGE)
used_pages = -(-POS // PAGE)
P = 1 + B * max_pages

key = jax.random.PRNGKey(0)


@jax.jit
def build():
    kq = jax.random.bits(key, (L, P, n_kv, PAGE, hd), jnp.uint8)
    vq = jax.random.bits(jax.random.fold_in(key, 1), (L, P, n_kv, PAGE, hd), jnp.uint8)
    if INT8:
        k_pool = kq.astype(jnp.int8)
        v_pool = vq.astype(jnp.int8)
        ks = jnp.full((L, P, n_kv, PAGE), 0.01, jnp.float32)
        vs = jnp.full((L, P, n_kv, PAGE), 0.01, jnp.float32)
        return k_pool, v_pool, ks, vs
    k_pool = (kq.astype(jnp.float32) / 64.0 - 1.0).astype(jnp.bfloat16)
    v_pool = (vq.astype(jnp.float32) / 64.0 - 1.0).astype(jnp.bfloat16)
    return k_pool, v_pool, None, None


pools = build()
k_pool, v_pool, ks_pool, vs_pool = pools
jax.tree.map(
    lambda a: a.block_until_ready(), [p for p in pools if p is not None]
)

# Each slot's pages laid out slot-major: slot b uses pages 1+b*max_pages ...
pt = np.zeros((B, max_pages), np.int32)
for b in range(B):
    pt[b] = 1 + b * max_pages + np.arange(max_pages)
pt = jnp.asarray(pt)
pos = jnp.full((B,), POS, jnp.int32)

qshape = (B, n_heads, hd) if S == 1 else (B, S, n_heads, hd)
knshape = (B, n_kv, hd) if S == 1 else (B, S, n_kv, hd)
q0 = jax.random.normal(jax.random.fold_in(key, 2), qshape, jnp.float32)
kn = jax.random.normal(jax.random.fold_in(key, 3), knshape, jnp.float32)
vn = jax.random.normal(jax.random.fold_in(key, 4), knshape, jnp.float32)


def layer_sweep_pallas(q):
    def body(carry, idx):
        qi = q + carry * 1e-30
        if S == 1:
            out = paged_gqa_decode_stacked(
                qi, kn, vn, k_pool, v_pool, pt, pos, idx,
                k_scale_pool=ks_pool, v_scale_pool=vs_pool,
            )
        else:
            out = paged_gqa_window_stacked(
                qi, kn, vn, k_pool, v_pool, pt, pos, idx,
                k_scale_pool=ks_pool, v_scale_pool=vs_pool,
            )
        return carry + jnp.sum(out.astype(jnp.float32)), None

    return body


def layer_sweep_xla(q):
    def body(carry, idx):
        qi = q if S > 1 else q[:, None]
        qi = qi + carry * 1e-30
        kl = jax.lax.dynamic_index_in_dim(k_pool, idx, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v_pool, idx, 0, keepdims=False)
        kw = {}
        if ks_pool is not None:
            kw = dict(
                k_scale_pool=jax.lax.dynamic_index_in_dim(ks_pool, idx, 0, keepdims=False),
                v_scale_pool=jax.lax.dynamic_index_in_dim(vs_pool, idx, 0, keepdims=False),
            )
        knw = kn if S > 1 else kn[:, None]
        vnw = vn if S > 1 else vn[:, None]
        out = gqa_attention_split_paged(
            qi.astype(jnp.bfloat16), kl, vl, pt,
            knw.astype(jnp.bfloat16), vnw.astype(jnp.bfloat16),
            pos, **kw,
        )
        return carry + jnp.sum(out.astype(jnp.float32)), None

    return body


def bench(name, sweep_body):
    def run(reps):
        idxs = jnp.arange(reps * L, dtype=jnp.int32) % L
        out, _ = jax.lax.scan(sweep_body(q0), jnp.float32(0), idxs)
        return out

    hi = max(REPS, 2)  # slope needs two distinct repeat counts
    lo = max(hi // 4, 1)
    fns = {r: jax.jit(lambda r=r: run(r)) for r in (lo, hi)}
    for f in fns.values():
        np.asarray(f())  # compile + warm
    times = {}
    for r, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f())
        times[r] = time.perf_counter() - t0
    per_sweep = (times[hi] - times[lo]) / (hi - lo)
    elem = 1 if INT8 else 2
    bytes_touched = L * B * used_pages * n_kv * PAGE * (hd * elem * 2 + (8 if INT8 else 0))
    gbs = bytes_touched / per_sweep / 1e9
    print(
        f"{name:7s} B={B} S={S} pos={POS} int8={int(INT8)}: "
        f"{per_sweep*1e3:7.3f} ms/step-attn  {gbs:6.1f} GB/s effective",
        flush=True,
    )


print(f"model={model} L={L} kv={n_kv} heads={n_heads} hd={hd} pool_pages={P}", flush=True)
if which in ("pallas", "both"):
    bench("pallas", layer_sweep_pallas)
if which in ("xla", "both"):
    bench("xla", layer_sweep_xla)
