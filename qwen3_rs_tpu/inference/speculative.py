"""Device-side n-gram speculative decoding (distribution-exact at any
temperature; token-for-token exact at temperature 0).

Single-stream decode is weight-bandwidth-bound: one token per forward
streams all ~8 GB of INT8 weights for 8B.  Verifying k drafted tokens in
one S=k+1 window streams the weights ONCE for up to k+1 emitted tokens —
on accepting text the tokens/sec multiplier approaches the acceptance
length.  The draft source is prompt-lookup / n-gram matching (the
assisted-generation family, e.g. arXiv:2304.04487 / vLLM's
prompt-lookup): propose the k tokens that followed the most recent
occurrence of the current bigram in the token history.

Everything — drafting, the verify forward, acceptance, the history
update — runs inside one ``lax.scan`` on device, so a chunk of R rounds
is a single dispatch (a host-side drafter would pay the relay RTT per
round, which would erase the win on this deployment).

Acceptance is distribution-exact for every temperature.  Greedy slots
(temperature 0): token-for-token EXACT vs the plain decode loop — the
verify forward recomputes the model's argmax at every position, so
acceptance only shortcuts computation, never changes output.  Stochastic
slots (serving path, ``spec_round_batched``): because the n-gram drafter
is DETERMINISTIC, the speculative-sampling correction (accept with
min(1, p/q), resample the residual on rejection; arXiv:2211.17192)
collapses to "sample t_i from the target distribution at each verify
position, accept while t_i equals the draft, and the first mismatch IS
the corrected sample" — no residual-distribution pass needed, and the
emitted prefix is distributed exactly as plain autoregressive sampling
(RNG-draw *order* differs from the non-speculative path; per-seed
reproducibility is preserved).  The single-stream ``spec_round`` stays
greedy-only: its sampler is the host xorshift64* stream, whose
reference-parity contract (one coin per emitted token) cannot absorb
per-round k+1 draws.

The reference has no speculative path (its scalar loop regenerates one
token per full pass, generation.rs:153-162); this is a beyond-parity
TPU-native capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_draft(hist: jax.Array, hlen: jax.Array, cur: jax.Array, k: int) -> jax.Array:
    """Propose ``k`` draft tokens after ``cur`` by bigram lookup.

    hist: [T] int32 — all consumed tokens; ``hist[hlen-1] == cur``.
    Finds the most recent j < hlen-1 with ``(hist[j-1], hist[j]) ==
    (hist[hlen-2], cur)`` — PREFERRING matches whose continuation window
    holds ``k`` real tokens (j ≤ hlen-1-k) — and returns
    ``hist[j+1 : j+1+k]``; entries with no valid source are -1 (never
    matches an argmax, so they can't be accepted).  Returns [k] int32.

    The full-window preference matters on repetitive text: a period-p
    cycle's most recent match sits p positions from the end, clipping the
    continuation to p-1 drafts — measured counts pinned at 2 (one
    accepted draft) on constant streams before this, capping the
    speculative multiplier at ~2 regardless of k.  An older occurrence of
    the same bigram continues the same cycle with all k drafts usable.
    """
    t = hist.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    prev = hist[jnp.maximum(hlen - 2, 0)]
    hist_prev = jnp.concatenate([hist[:1], hist[:-1]])
    m = (
        (hist == cur)
        & (hist_prev == prev)
        & (idx >= 1)
        & (idx < hlen - 1)
        & (hlen >= 2)
    )
    j_any = jnp.max(jnp.where(m, idx, -1))
    j_full = jnp.max(jnp.where(m & (idx <= hlen - 1 - k), idx, -1))
    j = jnp.where(j_full >= 0, j_full, j_any)
    found = j >= 0
    start = jnp.where(found, j + 1, 0)
    # dynamic_slice clamps start to t-k; out-of-history rows are masked.
    draft = jax.lax.dynamic_slice(hist, (jnp.minimum(start, t - k),), (k,))
    valid = found & (jnp.minimum(start, t - k) + jnp.arange(k) < hlen)
    return jnp.where(valid, draft, -1)


def spec_round_batched(fwd, weights, carry, k: int, page_table, active):
    """One batched speculative round for the serving scheduler.

    carry = (cur [B], cache, pos [B], hist [B, T], hlen [B], temps [B],
    topps [B], key).  Every slot runs draft-verify-accept — greedy slots
    accept by argmax match, stochastic slots by sampled-token match (exact
    speculative sampling for a deterministic drafter; see module
    docstring); inactive slots advance nothing.  Emits (tokens [B, k+1],
    counts [B]): slot b's round output is ``tokens[b, :counts[b]]``.
    """
    cur, cache, pos, hist, hlen, temps, topps, key = carry
    b = cur.shape[0]
    draft = jax.vmap(ngram_draft, in_axes=(0, 0, 0, None))(
        hist, hlen, cur, k
    )  # [B, k]
    window = jnp.concatenate([cur[:, None], jnp.maximum(draft, 0)], axis=1)
    logits, cache = fwd(
        weights, window, cache, pos, write_mask=active,
        page_table=page_table, return_all_logits=True,
    )  # [B, k+1, V]

    # Every verify position goes through the per-request sampler (one
    # batched call over [B·(k+1), V]); position i is accepted while the
    # sampled token equals the draft.  For greedy slots (temp 0) the sampler
    # is argmax, which is the classic exact greedy acceptance.  For
    # stochastic slots this is speculative SAMPLING with a deterministic
    # drafter: the draft distribution is a point mass, so the
    # accept-with-min(1, p/q) rule reduces to P(accept d_i) = p_i(d_i) and
    # the rejection-case residual distribution to p_i(·|· ≠ d_i) — both of
    # which "draw t_i ~ p_i, accept iff t_i == d_i, emit t_i either way"
    # realizes in one step.  Position i+1's logits were computed with d_i in
    # the window, which equals t_i whenever position i+1 is reached, so the
    # emitted prefix is distributed exactly as plain autoregressive
    # sampling.  (Streams differ from the non-speculative sampler only in
    # RNG-draw order; reproducibility-per-seed is preserved.)
    from ..ops.sampling import sample_tokens_jax

    key, sub = jax.random.split(key)

    def greedy_all(l, _):
        from ..ops.sampling import argmax_last_jax

        return argmax_last_jax(l)

    def sample_all(l, s):
        return sample_tokens_jax(
            l.reshape(b * (k + 1), -1),
            s,
            jnp.repeat(temps, k + 1),
            jnp.repeat(topps, k + 1),
        ).reshape(b, k + 1)

    # The common all-greedy batch skips the nucleus machinery entirely
    # (runtime branch, not a compile bucket — no extra warmup cost).
    toks = jax.lax.cond(jnp.all(temps == 0.0), greedy_all, sample_all, logits, sub)

    matches = (draft == toks[:, :k]).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)  # [B]
    counts = jnp.where(active, a + 1, 0)

    cur_next = jnp.take_along_axis(
        toks, jnp.maximum(counts - 1, 0)[:, None], axis=1
    )[:, 0]
    cur_next = jnp.where(active, cur_next, cur)

    iar = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    wpos = jnp.where(iar < counts[:, None], hlen[:, None] + iar, hist.shape[1])
    hist = hist.at[jnp.arange(b)[:, None], wpos].set(toks, mode="drop")
    new_carry = (
        cur_next, cache, pos + counts, hist, hlen + counts, temps, topps, key
    )
    return new_carry, (toks, counts)


def spec_round(fwd, weights, carry, k: int):
    """One speculative round: draft → verify (S=k+1 forward) → accept.

    carry = (cur [1], cache, pos [1], hist [T], hlen []).
    Emits (preds [k+1], count []): the first ``count`` entries of preds
    are this round's generated tokens (accepted drafts + one bonus).
    """
    cur, cache, pos, hist, hlen = carry
    draft = ngram_draft(hist, hlen, cur[0], k)  # [k]
    window = jnp.concatenate([cur, jnp.maximum(draft, 0)])[None, :]  # [1, k+1]
    logits, cache = fwd(weights, window, cache, pos, return_all_logits=True)
    from ..ops.sampling import argmax_last_jax

    preds = argmax_last_jax(logits[0])  # [k+1]; last-max ties like the host

    # preds[i] is the model's greedy token after consuming window[:i+1];
    # draft[i] is accepted iff it equals preds[i] and everything before it
    # was accepted — the emitted tokens are always preds[0..a] themselves.
    matches = (draft == preds[:k]).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(matches))
    count = a + 1
    cur_next = preds[a][None]

    iar = jnp.arange(k + 1, dtype=jnp.int32)
    wpos = jnp.where(iar < count, hlen + iar, hist.shape[0])
    hist = hist.at[wpos].set(preds, mode="drop")
    new_carry = (cur_next, cache, pos + count, hist, hlen + count)
    return new_carry, (preds, count)
