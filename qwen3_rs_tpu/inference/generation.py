"""Generation loops: single-shot ``generate`` and interactive ``chat``.

Capability parity with qwen3-inference/src/generation.rs, rebuilt around the
batched prefill/decode engine: the prompt is prefetched through one padded
prefill call instead of the reference's token-at-a-time feed.

Sampling parity: in chat mode the reference draws one RNG coin per *prompt*
token as well (it samples after every fed token and keeps only the last
sample, generation.rs:116-123); the loop here advances the xorshift stream
identically so a given seed reproduces the reference's token stream.

Known reference divergence (intentional): the reference's ``generate`` never
runs the model on prompt tokens (generation.rs:26-29 takes the `if` branch
without calling forward), so prompt positions 0..P-2 attend over zeroed KV
entries.  This engine prefills the prompt properly — matching the documented
intent (SURVEY §3.4) and the reference's own chat-mode behavior.
"""

from __future__ import annotations

import logging
import sys
from typing import Callable, Optional

import numpy as np

from .engine import Engine, TokenMetrics, TokenSampler
from .tokenizer import Tokenizer, Utf8StreamDecoder

logger = logging.getLogger(__name__)


def _emit(text: str, out=None):
    (out or sys.stdout).write(text)
    (out or sys.stdout).flush()


def generate(
    engine: Engine,
    tokenizer: Tokenizer,
    sampler: TokenSampler,
    prompt: Optional[str],
    out=None,
    spec_k: int = 0,
) -> list[int]:
    """Single-prompt generation (generation.rs:9-48). Returns generated ids.

    ``spec_k > 0`` enables n-gram speculative decoding (speculative.py) —
    greedy-exact, so it requires temperature 0 and device sampling."""
    prompt_tokens = tokenizer.encode(prompt or "")
    if not prompt_tokens:
        raise ValueError("Please provide a prompt")

    seq_len = engine.config.seq_len
    prompt_tokens = prompt_tokens[:seq_len]
    metrics = TokenMetrics()
    decoder = Utf8StreamDecoder()
    metrics.start_prefill()

    # Echo the prompt as the reference does while feeding it (generation.rs:41).
    _emit(decoder.push(b"".join(tokenizer.decode_bytes(t) for t in prompt_tokens)), out)

    cache = engine.new_cache(1)
    logits, cache = engine.prefill(
        cache, np.asarray([prompt_tokens], np.int32), np.zeros(1, np.int32)
    )

    generated: list[int] = []
    pos = len(prompt_tokens) - 1

    if spec_k > 0 and sampler.device and sampler.temperature == 0.0:
        # Speculative chunks: each round verifies spec_k drafted tokens in
        # one forward, emitting 1..spec_k+1 tokens — token-for-token equal
        # to the plain greedy loop (tests/test_speculative.py).
        metrics.start_generation()
        next_token = sampler.sample(logits)
        metrics.increment()
        done = tokenizer.is_termination(next_token)
        pos += 1
        history = list(prompt_tokens) + [next_token]
        rounds_per_chunk = 16
        while not done:
            generated.append(next_token)
            _emit(decoder.push(tokenizer.decode_bytes(next_token)), out)
            # n_rounds is a static jit argument: bucket it to powers of two
            # so the context-end taper costs at most a handful of compiles
            # instead of one per distinct remaining-room value.
            n_avail = (seq_len - pos) // (spec_k + 1)
            n_rounds = 0
            for rb in (rounds_per_chunk, 8, 4, 2, 1):
                if rb <= n_avail:
                    n_rounds = rb
                    break
            if n_rounds > 0:
                toks, counts, cache = engine.decode_chunk_spec(
                    cache, next_token, pos, n_rounds, spec_k, np.asarray(history)
                )
                emitted: list[int] = []
                for r in range(n_rounds):
                    emitted.extend(int(t) for t in toks[r, : counts[r]])
            else:
                # Tail: fewer than spec_k+1 rows left — a round could
                # overrun the cache, so finish with the plain chunk loop.
                room = seq_len - pos
                if room <= 0:
                    break
                tail, cache = engine.decode_chunk(
                    cache, next_token, pos, room, temperature=0.0
                )
                emitted = [int(t) for t in tail]
            pos += len(emitted)
            history.extend(emitted)
            for t in emitted[:-1]:
                metrics.increment()
                if tokenizer.is_termination(t):
                    done = True
                    break
                generated.append(t)
                _emit(decoder.push(tokenizer.decode_bytes(t)), out)
            else:
                next_token = emitted[-1]
                metrics.increment()
                done = tokenizer.is_termination(next_token)
                continue
            break
    elif sampler.device:
        # On-device chunked decode: the whole forward→sample loop runs in one
        # dispatch per chunk (per-step host round-trips would dominate).
        metrics.start_generation()
        next_token = sampler.sample(logits)
        metrics.increment()
        done = tokenizer.is_termination(next_token)
        chunk_size = 64
        pos += 1  # next_token is fed at position len(prompt)
        while not done:
            generated.append(next_token)
            _emit(decoder.push(tokenizer.decode_bytes(next_token)), out)
            if pos >= seq_len:
                break
            n = min(chunk_size, seq_len - pos)
            chunk, cache = engine.decode_chunk(
                cache,
                next_token,
                pos,
                n,
                temperature=sampler.temperature,
                topp=sampler.topp,
                key=sampler.next_key(),
            )
            pos += n
            for t in chunk[:-1]:
                t = int(t)
                metrics.increment()
                if tokenizer.is_termination(t):
                    done = True
                    break
                generated.append(t)
                _emit(decoder.push(tokenizer.decode_bytes(t)), out)
            else:
                # Last token of the chunk becomes the next chunk's input
                # (emitted at the top of the loop, like the single-step path).
                next_token = int(chunk[-1])
                metrics.increment()
                done = tokenizer.is_termination(next_token)
                continue
            break
    else:
        while True:
            metrics.start_generation()
            next_token = sampler.sample(logits)
            metrics.increment()
            if tokenizer.is_termination(next_token):
                break
            generated.append(next_token)
            _emit(decoder.push(tokenizer.decode_bytes(next_token)), out)
            pos += 1
            if pos >= seq_len:
                break
            logits, cache = engine.decode_step(
                cache, np.asarray([next_token]), np.asarray([pos])
            )

    _emit(decoder.flush(), out)
    metrics.report_and_reset()
    _emit("\n", out)
    return generated


def render_prompt(
    pos: int, system_prompt: Optional[str], user_prompt: str, tokenizer: Tokenizer
) -> str:
    """Template rendering (generation.rs:188-195).  Note: with a system
    prompt the reference substitutes *every* ``%s`` in the system template
    with the same "system\\nuser" string (Rust ``str::replace`` replaces all
    occurrences) — replicated verbatim."""
    if pos == 0 and system_prompt is not None:
        return tokenizer.system_prompt_template.replace("%s", f"{system_prompt}\n{user_prompt}")
    return tokenizer.prompt_template.replace("%s", user_prompt)


def chat(
    engine: Engine,
    tokenizer: Tokenizer,
    sampler: TokenSampler,
    cli_user_prompt: Optional[str] = None,
    system_prompt: Optional[str] = None,
    out=None,
    input_fn: Callable[[], str] = None,
) -> None:
    """Interactive chat loop (generation.rs:50-93)."""
    seq_len = engine.config.seq_len
    cache = engine.new_cache(1)
    pos = 0
    user_turn = True
    next_token = 0
    cli_consumed = False
    metrics = TokenMetrics()
    decoder = Utf8StreamDecoder()

    def read_user_input() -> str:
        if input_fn is not None:
            return input_fn()
        _emit("> ", out)
        return sys.stdin.readline().strip()

    while True:
        if pos >= seq_len:
            # Hard context reset when the window is exhausted
            # (generation.rs:65-69); cache entries are simply overwritten.
            metrics.report_and_reset()
            pos = 0
            user_turn = True
            _emit("\n", out)

        if user_turn:
            metrics.report_and_reset()
            if cli_user_prompt is not None and not cli_consumed:
                # The reference keys this on pos==0 (generation.rs:175-177),
                # which would re-feed the CLI prompt after a context reset;
                # an explicit consumed flag keeps the single-shot intent.
                user_prompt = cli_user_prompt
                cli_consumed = True
            elif cli_user_prompt is not None:
                break  # single-shot CLI prompt already consumed (generation.rs:177)
            else:
                user_prompt = read_user_input()
            if not user_prompt and not (pos == 0 and cli_user_prompt is not None):
                break

            rendered = render_prompt(pos, system_prompt, user_prompt, tokenizer)
            prompt_tokens = tokenizer.encode(rendered)
            prompt_tokens = prompt_tokens[: max(seq_len - pos, 0)]
            if not prompt_tokens:
                break

            metrics.start_prefill()
            logits, cache = engine.prefill(
                cache,
                np.asarray([prompt_tokens], np.int32),
                np.asarray([pos], np.int32),
            )
            # RNG parity: the reference samples after every prompt token and
            # keeps only the last result (generation.rs:116-123) — advance
            # the coin stream for the discarded draws.
            sampler.skip_draws(len(prompt_tokens) - 1)
            next_token = sampler.sample(logits)
            pos += len(prompt_tokens)
            user_turn = False
        else:
            if tokenizer.is_termination(next_token):
                metrics.report_and_reset()
                _emit(decoder.flush() + "\n", out)
                user_turn = True
                continue
            metrics.start_generation()
            _emit(decoder.push(tokenizer.decode_bytes(next_token)), out)
            if sampler.device:
                # Chunked assistant turn: forward + sampling on device, one
                # dispatch per chunk — the single-step path pays a host
                # round-trip per token.  Rows written past a mid-chunk EOS
                # are never attended before being overwritten (the next
                # turn's prefill starts at the EOS position).
                n = min(32, seq_len - pos)
                chunk_toks, cache = engine.decode_chunk(
                    cache,
                    next_token,
                    pos,
                    n,
                    temperature=sampler.temperature,
                    topp=sampler.topp,
                    key=sampler.next_key(),
                )
                stop_idx = None
                for idx in range(n - 1):
                    t = int(chunk_toks[idx])
                    metrics.increment()
                    if tokenizer.is_termination(t):
                        next_token = t
                        stop_idx = idx
                        break
                    _emit(decoder.push(tokenizer.decode_bytes(t)), out)
                if stop_idx is None:
                    next_token = int(chunk_toks[-1])
                    metrics.increment()
                    pos += n
                else:
                    pos += stop_idx + 1
            else:
                logits, cache = engine.decode_step(
                    cache, np.asarray([next_token]), np.asarray([pos])
                )
                next_token = sampler.sample(logits)
                metrics.increment()
                pos += 1
