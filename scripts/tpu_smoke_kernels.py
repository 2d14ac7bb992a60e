"""Tiny on-TPU smoke test for the new kernels: compile + run each once at
8B-like shapes, printing timings.  Run BEFORE any long bench after kernel
changes — a Mosaic lowering error or DMA deadlock shows up here in
seconds, not 20 minutes into bench.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()


def t0print(msg, t0):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


def main():
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    t0print(f"devices: {jax.devices()}", t0)

    # ---- flash decode v2 (bf16 cache) ----
    from qwen3_rs_tpu.ops.pallas.flash_attention import flash_gqa_decode_stacked

    L, B, n_kv, hd, T = 2, 1, 8, 128, 1024
    n_heads = 32
    k_all = jax.random.normal(key, (L, B, n_kv, T, hd), jnp.bfloat16)
    v_all = jax.random.normal(key, (L, B, n_kv, T, hd), jnp.bfloat16)
    q = jax.random.normal(key, (B, n_heads, hd), jnp.float32)
    kn = jax.random.normal(key, (B, n_kv, hd), jnp.float32)
    vn = jax.random.normal(key, (B, n_kv, hd), jnp.float32)
    pos = jnp.asarray([700], jnp.int32)
    out = flash_gqa_decode_stacked(q, kn, vn, k_all, v_all, pos, 1)
    got = np.asarray(out)
    t0print(f"flash v2 bf16: ok, |out|={np.abs(got).mean():.4f}", t0)

    # parity vs XLA split path
    from qwen3_rs_tpu.ops.attention import gqa_attention_split

    ref = np.asarray(
        gqa_attention_split(
            q[:, None], k_all[1], v_all[1], kn[:, None], vn[:, None],
            pos[:, None], pos,
        )
    )[:, 0]
    err = np.abs(got - ref).max()
    t0print(f"flash v2 parity vs XLA: max err {err:.2e}", t0)
    assert err < 2e-2, err

    # ---- flash decode v2 (int8 cache) ----
    k8 = jax.random.randint(key, (L, B, n_kv, T, hd), -127, 128, jnp.int8)
    v8 = jax.random.randint(key, (L, B, n_kv, T, hd), -127, 128, jnp.int8)
    ks = jax.random.uniform(key, (L, B, n_kv, T), jnp.float32, 0.005, 0.02)
    vs = jax.random.uniform(key, (L, B, n_kv, T), jnp.float32, 0.005, 0.02)
    out8 = flash_gqa_decode_stacked(
        q, kn, vn, k8, v8, pos, 1, k_scale_all=ks, v_scale_all=vs
    )
    ref8 = np.asarray(
        gqa_attention_split(
            q[:, None], k8[1], v8[1], kn[:, None], vn[:, None],
            pos[:, None], pos, k_scale_cache=ks[1], v_scale_cache=vs[1],
        )
    )[:, 0]
    err8 = np.abs(np.asarray(out8) - ref8).max()
    t0print(f"flash v2 int8 parity: max err {err8:.2e}", t0)
    assert err8 < 2e-2, err8

    # ---- fused qmatmul (rms / swiglu / residual) at 8B shapes ----
    from qwen3_rs_tpu.ops.norms import rms_norm
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked,
        qmatmul_pallas_stacked_fused,
    )
    from qwen3_rs_tpu.ops.quant import QuantizedTensor

    Lw, n, d, g = 2, 4096, 6144, 64
    wq = jax.random.randint(key, (Lw, n, d), -127, 128, jnp.int8)
    ws = jax.random.uniform(key, (Lw, n // g, d), jnp.bfloat16, 0.0, 0.02)
    w = QuantizedTensor(wq, ws)
    nw = 1.0 + 0.02 * jax.random.normal(key, (Lw, n), jnp.float32)
    x = jax.random.normal(key, (1, n), jnp.float32)
    fused = np.asarray(
        qmatmul_pallas_stacked_fused(x, w, 1, norm_w=nw, eps=1e-6)
    )
    ref_n = np.asarray(
        qmatmul_pallas_stacked(rms_norm(x, nw[1], 1e-6), w, 1)
    )
    errn = np.abs(fused - ref_n).max() / (np.abs(ref_n).max() + 1e-9)
    t0print(f"fused rms prologue: rel err {errn:.2e}", t0)
    assert errn < 2e-2, errn

    h, d2 = 12288, 4096
    wq2 = jax.random.randint(key, (Lw, h, d2), -127, 128, jnp.int8)
    ws2 = jax.random.uniform(key, (Lw, h // g, d2), jnp.bfloat16, 0.0, 0.02)
    w2 = QuantizedTensor(wq2, ws2)
    gate_up = jax.random.normal(key, (1, 2 * h), jnp.float32)
    res = jax.random.normal(key, (1, d2), jnp.float32)
    fused2 = np.asarray(
        qmatmul_pallas_stacked_fused(gate_up, w2, 0, swiglu=True, residual=res)
    )
    gg, uu = gate_up[:, :h], gate_up[:, h:]
    hh = gg * jax.nn.sigmoid(gg) * uu
    ref2 = res + np.asarray(qmatmul_pallas_stacked(hh, w2, 0))
    err2 = np.abs(fused2 - np.asarray(ref2)).max() / (np.abs(ref2).max() + 1e-9)
    t0print(f"fused swiglu+residual: rel err {err2:.2e}", t0)
    assert err2 < 2e-2, err2

    t0print("ALL KERNEL SMOKE TESTS PASSED", t0)


if __name__ == "__main__":
    main()
