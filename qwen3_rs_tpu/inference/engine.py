"""Inference engine: jitted prefill/decode over a loaded checkpoint.

The reference engine's shape is a mutable ``Transformer::forward(token, pos)``
scalar loop (qwen3-inference/src/models/qwen3.rs:62-79).  The TPU-native
engine instead compiles two pure functions over batched state:

* ``prefill(tokens[B, S])`` — bucket-padded prompt windows, one MXU-saturating
  pass (the reference feeds prompt tokens one at a time, generation.rs:26-29);
* ``decode_step(token[B])`` — one token per request per step, KV cache donated
  so XLA updates it in place.

Sampling runs either through the reference-parity host sampler (same
xorshift64* stream as the Rust engine) or fully on device.
"""

from __future__ import annotations

import functools
import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_checkpoint
from ..configuration import ModelConfig
from ..models.qwen3 import KVCache, Qwen3Weights, init_kv_cache, qwen3_forward
from ..ops.sampling import Sampler, sample_tokens_jax

logger = logging.getLogger(__name__)

PREFILL_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


class Engine:
    """Loads a checkpoint and serves prefill/decode.

    Parameters
    ----------
    checkpoint:
        Path to a native checkpoint directory or a legacy ``.bin`` file.
    ctx_length:
        Optional context override, clamped to the checkpoint seq_len
        (reference: models/mod.rs:65-67).
    mode:
        ``"fast"`` (W8A16, Pallas kernels — the production path) or
        ``"exact"`` (W8A8 with reference-matching rounding, for parity).
    cache_dtype:
        KV cache dtype; f32 matches the reference, bf16 halves cache HBM.
    """

    def __init__(
        self,
        checkpoint: str | Path | None = None,
        *,
        config: ModelConfig | None = None,
        weights: Qwen3Weights | None = None,
        ctx_length: Optional[int] = None,
        mode: str = "fast",
        cache_dtype=jnp.float32,
        batch_size: int = 1,
        sp_mesh=None,
        sp_threshold: int = 4096,
    ):
        if checkpoint is not None:
            config, weights = load_checkpoint(checkpoint)
        assert config is not None and weights is not None
        self.config = config.with_seq_len(ctx_length).validate()
        if mode == "fast":
            from ..models.qwen3 import cast_weight_scales

            # bf16 scales: identical numerics on the Pallas path (which
            # loads scales as bf16 anyway), 3% less decode HBM traffic.
            weights = cast_weight_scales(weights)
        self.weights = weights
        self.mode = mode
        self.cache_dtype = cache_dtype
        self.batch_size = batch_size

        fwd = functools.partial(qwen3_forward, self.config, mode=mode)

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=(5,))
        def _prefill(weights, tokens, cache, pos_start, out_idx, fresh):
            return fwd(
                weights, tokens, cache, pos_start, out_idx=out_idx,
                fresh_prefill=fresh,
            )

        # Sequence-parallel prefill: fresh windows of >= sp_threshold rows
        # that divide the sp axis run ring attention (parallel/context.py)
        # — prompts whose score memory outgrows one chip shard over sp.
        self.sp_mesh = sp_mesh
        self.sp_threshold = sp_threshold
        self._prefill_sp = None
        if sp_mesh is not None:

            @functools.partial(jax.jit, donate_argnums=(2,))
            def _prefill_sp(weights, tokens, cache, pos_start, out_idx):
                return fwd(
                    weights, tokens, cache, pos_start, out_idx=out_idx,
                    fresh_prefill=True, sp_mesh=sp_mesh,
                )

            self._prefill_sp = _prefill_sp

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(weights, tokens, cache, pos_start):
            return fwd(weights, tokens, cache, pos_start)

        self._prefill = _prefill
        self._decode = _decode
        self._logits_all = jax.jit(
            functools.partial(fwd, return_all_logits=True), donate_argnums=(2,)
        )

        @functools.partial(
            jax.jit, donate_argnums=(2,), static_argnums=(5, 6, 7)
        )
        def _decode_loop(weights, token, cache, pos, key, n_steps, temperature, topp):
            """n_steps decode iterations fully on device — one dispatch for
            the whole chunk (host round-trips through the runtime cost ~ms;
            the reference's token-at-a-time loop shape would be dispatch
            bound).  Sampling happens in-graph; EOS is handled by the host
            truncating the returned chunk."""
            from ..ops.sampling import sample_tokens_jax

            def body(carry, _):
                token, cache, pos, key = carry
                logits, cache = fwd(weights, token, cache, pos)
                key, sub = jax.random.split(key)
                nxt = sample_tokens_jax(logits, sub, temperature, topp)
                return (nxt[:, None], cache, pos + 1, key), nxt

            (token, cache, pos, key), toks = jax.lax.scan(
                body, (token, cache, pos, key), None, length=n_steps
            )
            return toks, cache

        self._decode_loop = _decode_loop

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=(6, 7))
        def _spec_loop(weights, token, cache, pos, hist, hlen, n_rounds, k):
            """n_rounds of n-gram speculative decode on device (greedy):
            draft k tokens from the history, verify them in one S=k+1
            forward, emit accepted run + bonus token.  See speculative.py."""
            from .speculative import spec_round

            def body(carry, _):
                return spec_round(fwd, weights, carry, k)

            carry = (token, cache, pos, hist, hlen)
            (_, cache, _, _, _), (toks, counts) = jax.lax.scan(
                body, carry, None, length=n_rounds
            )
            return toks, counts, cache

        self._spec_loop = _spec_loop

    # ------------------------------------------------------------------ api
    def new_cache(self, batch_size: Optional[int] = None) -> KVCache:
        return init_kv_cache(
            self.config, batch_size or self.batch_size, dtype=self.cache_dtype
        )

    # Long prompts prefill in windows of this size: past ~4 row blocks the
    # prefill matmul kernel's weight re-streaming stops overlapping fully
    # with the MXU (8B measured ~99% MFU at 2048 rows, ~70% at 4096), so two
    # 2k windows beat one 4k window; the continuation window attends over
    # the already-written cache prefix exactly like a chat turn.
    MAX_PREFILL_WINDOW = 2048

    def prefill(
        self, cache: KVCache, prompt_tokens: np.ndarray, pos_start: np.ndarray
    ) -> tuple[jax.Array, KVCache]:
        """Run a prompt window. prompt_tokens [B, S_real] is right-padded to
        a bucket; returns logits [B, V] at each row's last real token."""
        b, s_real = prompt_tokens.shape
        w = self.MAX_PREFILL_WINDOW
        pos0 = np.asarray(pos_start, np.int32).reshape(b)
        if (
            self._prefill_sp is not None
            and s_real >= self.sp_threshold
            and bool((pos0 == 0).all())
        ):
            # Sequence-parallel prompt: one ring-attention prefill over the
            # sp mesh instead of host-side window chunking.
            return self._prefill_window(cache, prompt_tokens, pos0)
        if s_real > w:
            pos_arr = pos0
            logits = None
            for off in range(0, s_real, w):
                logits, cache = self._prefill_window(
                    cache, prompt_tokens[:, off : off + w], pos_arr + off
                )
            return logits, cache
        return self._prefill_window(
            cache, prompt_tokens, np.asarray(pos_start, np.int32).reshape(b)
        )

    def _prefill_window(
        self, cache: KVCache, prompt_tokens: np.ndarray, pos_arr: np.ndarray
    ) -> tuple[jax.Array, KVCache]:
        b, s_real = prompt_tokens.shape
        # Pad to a compile bucket, but never beyond the room left in the
        # cache: the KV scatter's dynamic_update_slice clamps its start
        # index, so a window wider than seq_len - pos would silently shift
        # the writes onto earlier (real) cache rows.
        room = cache.seq_len - int(pos_arr.max())
        if s_real > room:
            raise ValueError(
                f"prompt window of {s_real} tokens does not fit the cache: "
                f"{room} rows left of {cache.seq_len} (pos {int(pos_arr.max())})"
            )
        s_pad = max(s_real, min(_bucket(s_real), room))
        padded = np.zeros((b, s_pad), np.int32)
        padded[:, :s_real] = prompt_tokens
        out_idx = np.full((b,), s_real - 1, np.int32)
        fresh = bool((pos_arr == 0).all())
        if (
            fresh
            and self._prefill_sp is not None
            and s_pad >= self.sp_threshold
            and s_pad % self.sp_mesh.shape.get("sp", 1) == 0
        ):
            return self._prefill_sp(
                self.weights,
                jnp.asarray(padded),
                cache,
                jnp.asarray(pos_arr),
                jnp.asarray(out_idx),
            )
        logits, cache = self._prefill(
            self.weights,
            jnp.asarray(padded),
            cache,
            jnp.asarray(pos_arr),
            jnp.asarray(out_idx),
            fresh,  # static: fresh prefill → splash path
        )
        return logits, cache

    def decode_step(
        self, cache: KVCache, tokens: jax.Array, pos: jax.Array
    ) -> tuple[jax.Array, KVCache]:
        """One decode step: tokens [B], pos [B] → logits [B, V]."""
        b = tokens.shape[0]
        return self._decode(
            self.weights,
            jnp.asarray(tokens, jnp.int32).reshape(b, 1),
            cache,
            jnp.asarray(pos, jnp.int32).reshape(b),
        )

    def decode_chunk(
        self,
        cache: KVCache,
        token: int,
        pos: int,
        n_steps: int,
        *,
        temperature: float = 0.0,
        topp: float = 0.9,
        key: Optional[jax.Array] = None,
    ) -> tuple[np.ndarray, KVCache]:
        """Run ``n_steps`` decode+sample iterations on device (single
        dispatch) starting from ``token`` at ``pos``.  Returns the sampled
        token ids [n_steps] (batch 1).  On-device sampling: greedy is exact;
        top-p uses jax PRNG (seeded-reproducible, not xorshift-parity)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        toks, cache = self._decode_loop(
            self.weights,
            jnp.asarray([[token]], jnp.int32),
            cache,
            jnp.asarray([pos], jnp.int32),
            key,
            n_steps,
            float(temperature),
            float(topp),
        )
        return np.asarray(toks)[:, 0], cache

    def decode_chunk_spec(
        self,
        cache: KVCache,
        token: int,
        pos: int,
        n_rounds: int,
        k: int,
        history: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, KVCache]:
        """``n_rounds`` speculative (n-gram draft, greedy) rounds on device.

        ``history`` holds every consumed token so far (prompt + generated,
        ending with ``token``).  Each round emits between 1 and k+1 tokens;
        the caller must guarantee ``pos + n_rounds*(k+1) <= seq_len``.
        Returns (tokens [n_rounds, k+1], counts [n_rounds], cache): round r's
        generated tokens are ``tokens[r, :counts[r]]`` (greedy-exact vs the
        plain decode loop).
        """
        # Keep the most recent seq_len tokens — recency is what the bigram
        # drafter matches against, and hist is a fixed [seq_len] buffer.
        history = np.asarray(history, np.int32)[-self.config.seq_len :]
        hlen = len(history)
        hist = np.zeros((self.config.seq_len,), np.int32)
        hist[:hlen] = history
        toks, counts, cache = self._spec_loop(
            self.weights,
            jnp.asarray([token], jnp.int32),
            cache,
            jnp.asarray([pos], jnp.int32),
            jnp.asarray(hist),
            jnp.asarray(hlen, jnp.int32),
            n_rounds,
            k,
        )
        return np.asarray(toks), np.asarray(counts), cache

    def all_logits(self, cache: KVCache, tokens, pos_start) -> tuple[jax.Array, KVCache]:
        """Logits for every position (perplexity evaluation)."""
        b, s = tokens.shape
        return self._logits_all(
            self.weights,
            jnp.asarray(tokens, jnp.int32),
            cache,
            jnp.asarray(pos_start, jnp.int32).reshape(b),
        )


class TokenMetrics:
    """tokens/sec + TTFT reporter (reference: generation.rs:198-233, which
    reports only tokens/sec; TTFT is added per the TPU serving target)."""

    def __init__(self):
        self.start_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.prefill_start: Optional[float] = None
        self.generated = 0

    def start_prefill(self):
        if self.prefill_start is None:
            self.prefill_start = time.perf_counter()

    def start_generation(self):
        if self.start_time is None:
            self.start_time = time.perf_counter()

    def increment(self):
        if self.first_token_time is None:
            self.first_token_time = time.perf_counter()
        self.generated += 1

    def report_and_reset(self) -> Optional[dict]:
        stats = None
        if self.start_time is not None:
            duration = time.perf_counter() - self.start_time
            if self.generated > 0 and duration > 0:
                stats = {
                    "tokens": self.generated,
                    "seconds": duration,
                    "tokens_per_sec": self.generated / duration,
                }
                if self.prefill_start is not None and self.first_token_time is not None:
                    stats["ttft_sec"] = self.first_token_time - self.prefill_start
                logger.info(
                    "[Generated %d tokens in %.2fs - %.2f tokens/sec]",
                    stats["tokens"],
                    stats["seconds"],
                    stats["tokens_per_sec"],
                )
        self.__init__()
        return stats


class TokenSampler:
    """Unified host/device sampling front-end for the generation loops."""

    def __init__(self, temperature: float, topp: float, seed: int, device: bool = False):
        self.temperature = temperature
        self.topp = topp
        self.device = device
        self._host = Sampler(temperature, topp, seed)
        self._key = jax.random.PRNGKey(seed)

    def sample(self, logits: jax.Array) -> int:
        """logits [1, V] or [V] → token id."""
        logits = logits.reshape(-1)
        if self.device:
            self._key, sub = jax.random.split(self._key)
            return int(
                sample_tokens_jax(logits[None, :], sub, self.temperature, self.topp)[0]
            )
        return self._host.sample(np.asarray(logits))

    def next_key(self) -> jax.Array:
        """Fresh PRNG key for an on-device sampling chunk."""
        self._key, sub = jax.random.split(self._key)
        return sub

    def skip_draws(self, n: int):
        """Advance the RNG stream by n discarded draws.  The reference's chat
        loop samples once per fed prompt token and drops all but the last
        result (generation.rs:116-123); each such sample consumes exactly one
        coin when temperature > 0 (sampler.rs:116-136)."""
        if self.temperature == 0.0 or n <= 0:
            return
        if self.device:
            for _ in range(n):
                self._key, _ = jax.random.split(self._key)
        else:
            for _ in range(n):
                self._host.rng.random_f32()
