"""RMS normalization.

TPU-native counterpart of the reference RMSNorm
(qwen3-inference/src/layers.rs:100-131): ``x / sqrt(mean(x²) + ε) * γ`` with
ε added *inside* the sqrt after the mean (note the reference adds ε to the
mean, not to the sum).  All math in f32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Normalize the last axis. weight broadcasts over leading axes."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    return (weight.astype(jnp.float32) * (xf * inv)).astype(x.dtype)
