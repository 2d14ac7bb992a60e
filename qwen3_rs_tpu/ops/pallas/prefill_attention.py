"""Causal prefill attention via the TPU splash-attention Pallas kernel.

The XLA prefill path (ops/attention.py) materializes per-chunk f32 score
tensors in HBM — ~S²/2 × n_heads × 4 B per layer even with causal key
slicing, which measured as a large share of 8B prefill time.  The splash
kernel (jax.experimental.pallas.ops.tpu.splash_attention — the production
MaxText prefill kernel) keeps score tiles in VMEM with an online softmax
and skips fully-masked key blocks natively.

GQA mapping: the MQA variant of the kernel takes ``q [heads, S, hd]``
against a single shared ``k/v [S, hd]`` — vmapping it over (batch, kv-head)
with queries grouped ``[B, n_kv, kv_mul, S, hd]`` gives grouped-query
attention without materializing a broadcast K/V (the reference walks
query-heads against their kv head the same way, layers.rs:385).

Only the **fresh-prefill** case (every request at position 0, no cache
prefix — the reference's generate-mode prompt phase, generation.rs:26-29)
routes here; continuation prefills (chat turn ≥ 2) keep the split
cache+window path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_BLOCK = 1024  # measured (scripts/prefill_profile.py, 8B s=4096): 1024
# blocks run the causal sweep at 110.5 TF/s vs 91.3 at 512 and 29.0 at 256
# (+17% on the attention share); windows smaller than the block clamp to
# the window.


def _block() -> int:
    """Splash q/kv block edge (sweepable: scripts/prefill_profile.py).
    Read at kernel-build time and part of the build cache key, so env
    toggling between separately-jitted closures A/Bs real variants."""
    return int(os.environ.get("QWEN3_TPU_SPLASH_BLOCK", _BLOCK))


def _effective_block(s: int) -> int:
    """Largest block in {configured, /2, ..., 512} that divides the window
    (e.g. a 1536 window runs 512 blocks).  Never below 512: windows that
    512 doesn't divide keep the XLA fallback, exactly as before the
    default block moved to 1024."""
    blk = max(min(_block(), s), 512)
    while blk > 512 and s % blk:
        blk //= 2
    return blk


def splash_prefill_supported(s: int, head_dim: int, n_heads: int, n_kv: int) -> bool:
    """Kernel constraints: 128-lane head_dim, window divisible into blocks,
    and a whole number of query heads per kv head."""
    blk = _effective_block(s)
    return (
        head_dim % 128 == 0
        and s % blk == 0
        and s >= blk
        and n_heads % n_kv == 0
    )


@functools.lru_cache(maxsize=16)
def _make_kernel(s: int, kv_mul: int, interpret: bool, block: int | None = None):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as mk,
    )

    mask = mk.MultiHeadMask([mk.CausalMask((s, s)) for _ in range(kv_mul)])
    block = min(block if block is not None else _BLOCK, s)
    sizes = sk.BlockSizes(block_q=block, block_kv=block, block_kv_compute=block)
    # Kernel construction materializes mask-info arrays; built inside a jit
    # trace those would be tracers (leaking through this cache) — force
    # concrete values.
    with jax.ensure_compile_time_eval():
        return sk.make_splash_mqa_single_device(
            mask, block_sizes=sizes, interpret=interpret
        )


def causal_prefill_attention(
    q: jax.Array,  # [B, S, n_heads, hd]
    k_new: jax.Array,  # [B, S, n_kv, hd]
    v_new: jax.Array,  # [B, S, n_kv, hd]
    *,
    interpret: bool = False,
) -> jax.Array:
    """Pure causal attention over the window → [B, S, n_heads, hd] (q.dtype).

    Exactly ``gqa_attention_split(..., pos_start=0)``: row i attends window
    rows j ≤ i.  The kernel applies no scale internally, so q is pre-scaled
    by 1/√head_dim (layers.rs:375).
    """
    b, s, n_heads, hd = q.shape
    n_kv = k_new.shape[2]
    kv_mul = n_heads // n_kv
    scale = 1.0 / (hd**0.5)

    # [B, S, H, hd] → [B, n_kv, kv_mul, S, hd] / [B, n_kv, S, hd]
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(b, n_kv, kv_mul, s, hd) * scale
    kt = jnp.transpose(k_new, (0, 2, 1, 3))
    vt = jnp.transpose(v_new, (0, 2, 1, 3))

    kernel = _make_kernel(s, kv_mul, interpret, _effective_block(s))
    out = jax.vmap(jax.vmap(kernel))(qt, kt, vt)  # [B, n_kv, kv_mul, S, hd] f32
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, s, n_heads, hd)
    return out.astype(q.dtype)
