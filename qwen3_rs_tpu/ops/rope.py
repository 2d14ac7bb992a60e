"""Rotary position embeddings (RoPE), rotate-half convention.

TPU-native counterpart of the reference RoPE
(qwen3-inference/src/layers.rs:152-186): frequency
``theta^(-i/(d/2))`` for pair ``(x[i], x[i + d/2])``.  Where the reference
recomputes cos/sin per position per token (layers.rs:339), here the full
``[seq_len, head_dim/2]`` table is precomputed once and gathered per
position — the table is tiny and the gather fuses into the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_table(seq_len: int, head_dim: int, theta: float = 1e6) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [seq_len, head_dim // 2]."""
    half = head_dim // 2
    # freq_i = theta^(-i/half)  (layers.rs:166)
    freqs = jnp.power(theta, -jnp.arange(half, dtype=jnp.float32) / half)
    angles = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * freqs[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (x[..., i], x[..., i + d/2]) (layers.rs:173-185).

    x: [..., head_dim]; cos/sin broadcastable to [..., head_dim // 2].
    """
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
