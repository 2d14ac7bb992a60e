"""Perplexity evaluation — the accuracy bar for the quantized engine.

The reference has no evaluation tooling (SURVEY §5: only a tokens/sec
reporter); the build target however requires matching the fp32 reference
perplexity within the group-quant (g=64) error bound (BASELINE.md).  This
module computes perplexity for any engine mode, so the delta
``ppl(int8 engine) − ppl(f32 dequantized reference)`` is directly
measurable on the same checkpoint:

* ``fast``  — the production W8A16 path
* ``exact`` — the reference-parity W8A8 path
* ``f32``   — dequantized weights, full-f32 matmuls (the fp32 baseline)
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .configuration import ModelConfig
from .models.qwen3 import Qwen3Weights, init_kv_cache, qwen3_forward


@dataclasses.dataclass
class PerplexityResult:
    perplexity: float
    avg_nll: float
    n_tokens: int

    def delta_vs(self, other: "PerplexityResult") -> float:
        return self.perplexity - other.perplexity


def _window_nll(config, weights, tokens_win, n_valid, *, mode):
    """Sum of next-token NLLs over one [1, S] window (f32 log-softmax).

    ``n_valid`` counts the prediction targets: positions 1..n_valid predict
    tokens[1..n_valid]."""
    cache = init_kv_cache(config, 1, dtype=jnp.float32, seq_len=tokens_win.shape[1])
    logits, _ = qwen3_forward(
        config,
        weights,
        tokens_win,
        cache,
        jnp.zeros(1, jnp.int32),
        mode=mode,
        return_all_logits=True,
    )  # [1, S, V]
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = tokens_win[:, 1:]  # [1, S-1]
    tok_lp = jnp.take_along_axis(logprobs[:, :-1, :], targets[..., None], axis=-1)[..., 0]
    idx = jnp.arange(tok_lp.shape[1])[None, :]
    mask = idx < n_valid
    return -jnp.sum(jnp.where(mask, tok_lp, 0.0))


def compute_perplexity(
    config: ModelConfig,
    weights: Qwen3Weights,
    token_ids: Sequence[int],
    *,
    mode: str = "fast",
    window: Optional[int] = None,
) -> PerplexityResult:
    """Sliding-window perplexity over a token stream.

    Windows are independent (no cross-window context) and overlap by one
    token, so every token after the first is scored exactly once (the first
    token of each window is context only).
    """
    window = min(window or config.seq_len, config.seq_len)
    ids = np.asarray(token_ids, np.int64)
    if len(ids) < 2:
        raise ValueError("Need at least 2 tokens to evaluate perplexity")

    # Weights are a jit ARGUMENT: closing over them would embed the full
    # pytree as compile-time constants (multi-GB programs; the axon relay's
    # remote-compile rejects them outright).
    fn = jax.jit(functools.partial(_window_nll, config, mode=mode))

    total_nll = 0.0
    total_count = 0
    start = 0
    while start + 1 < len(ids):
        chunk = ids[start : start + window]
        n_valid = len(chunk) - 1
        if n_valid < 1:
            break
        padded = np.zeros((1, window), np.int32)
        padded[0, : len(chunk)] = chunk
        total_nll += float(fn(weights, jnp.asarray(padded), jnp.asarray(n_valid)))
        total_count += n_valid
        start += window - 1

    avg = total_nll / total_count
    return PerplexityResult(perplexity=math.exp(avg), avg_nll=avg, n_tokens=total_count)


def _window_logprobs(config, weights, tokens_win, *, mode):
    cache = init_kv_cache(config, 1, dtype=jnp.float32, seq_len=tokens_win.shape[1])
    logits, _ = qwen3_forward(
        config, weights, tokens_win, cache, jnp.zeros(1, jnp.int32),
        mode=mode, return_all_logits=True,
    )  # [1, S, V]
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def logit_kl(
    config: ModelConfig,
    weights: Qwen3Weights,
    token_ids: Sequence[int],
    *,
    mode_p: str = "f32",
    mode_q: str = "fast",
    window: Optional[int] = None,
) -> dict:
    """Per-position KL(p‖q) between two engine modes' next-token
    distributions over a token stream (same windowing as
    compute_perplexity).

    A distribution-level accuracy metric that, unlike fixture perplexity
    deltas (which sit inside sampling noise and can go negative), measures
    directly how far the quantized engine's predictive distribution sits
    from the f32 reference — it is ≥ 0 by construction and scales with the
    quantization error.  Returns {mean, p99, max, n_positions} in nats."""
    window = min(window or config.seq_len, config.seq_len)
    ids = np.asarray(token_ids, np.int64)
    if len(ids) < 2:
        raise ValueError("Need at least 2 tokens")
    fp = jax.jit(functools.partial(_window_logprobs, config, mode=mode_p))
    fq = jax.jit(functools.partial(_window_logprobs, config, mode=mode_q))

    kls = []
    start = 0
    while start + 1 < len(ids):
        chunk = ids[start : start + window]
        n_valid = len(chunk) - 1
        if n_valid < 1:
            break
        padded = np.zeros((1, window), np.int32)
        padded[0, : len(chunk)] = chunk
        w = jnp.asarray(padded)
        lp = np.asarray(fp(weights, w), np.float32)[0, :n_valid]
        lq = np.asarray(fq(weights, w), np.float32)[0, :n_valid]
        kls.append(np.sum(np.exp(lp) * (lp - lq), axis=-1))
        start += window - 1
    kl = np.concatenate(kls)
    kl = np.maximum(kl, 0.0)  # clip float round-off on near-identical dists
    return {
        "mean": float(kl.mean()),
        "p99": float(np.percentile(kl, 99)),
        "max": float(kl.max()),
        "n_positions": int(kl.size),
    }


def quantization_error_bound(config: ModelConfig) -> float:
    """Worst-case per-element relative reconstruction error of Q8_0 group
    quantization: half a quantization step of the group max, i.e.
    ``1/(2·127)`` of the group's max-abs value (model_exporter.rs:123-143)."""
    return 1.0 / (2 * 127)


def evaluate_checkpoint(
    checkpoint_path,
    text: Optional[str] = None,
    token_ids: Optional[Sequence[int]] = None,
    *,
    modes: Sequence[str] = ("fast", "f32"),
    window: Optional[int] = None,
) -> dict[str, PerplexityResult]:
    """Perplexity of one checkpoint under several engine modes."""
    from .checkpoint import load_checkpoint
    from .inference.tokenizer import Tokenizer

    config, weights = load_checkpoint(checkpoint_path)
    if token_ids is None:
        if text is None:
            raise ValueError("provide text or token_ids")
        tokenizer = Tokenizer(checkpoint_path, config.vocab_size)
        token_ids = tokenizer.encode(text)
    return {
        mode: compute_perplexity(config, weights, token_ids, mode=mode, window=window)
        for mode in modes
    }
