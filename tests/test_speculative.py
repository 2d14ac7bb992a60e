"""Speculative (n-gram draft) decoding: greedy-exact parity + drafting."""

import numpy as np
import jax.numpy as jnp
import pytest

from utils import make_hf_model_dir

from qwen3_rs_tpu.inference import Engine
from qwen3_rs_tpu.inference.speculative import ngram_draft


class TestNgramDraft:
    def _draft(self, history, cur, k, t=32):
        hist = np.zeros(t, np.int32)
        hist[: len(history)] = history
        return np.asarray(
            ngram_draft(jnp.asarray(hist), jnp.int32(len(history)), jnp.int32(cur), k)
        )

    def test_matches_most_recent_bigram(self):
        # history ends with (7, 8); earlier (7, 8) occurs twice — the most
        # recent continuation (5, 6, 7) wins over the older (1, 2, 3).
        h = [7, 8, 1, 2, 3, 7, 8, 5, 6, 7, 7, 8]
        assert self._draft(h, cur=8, k=3).tolist() == [5, 6, 7]

    def test_no_match_gives_invalid(self):
        assert self._draft([1, 2, 3, 4], cur=4, k=3).tolist() == [-1, -1, -1]

    def test_continuation_spans_to_current_token(self):
        # match at the (3, 4) bigram at j=1; everything after it (including
        # the current bigram's own tokens) is valid draft material.
        h = [3, 4, 9, 3, 4]
        assert self._draft(h, cur=4, k=3).tolist() == [9, 3, 4]

    def test_continuation_clipped_at_history_end(self):
        # (4, 4) matches at j=2; only one history token follows it.
        h = [7, 4, 4, 4]
        assert self._draft(h, cur=4, k=3).tolist() == [4, -1, -1]

    def test_short_history(self):
        assert self._draft([5], cur=5, k=2).tolist() == [-1, -1]

    def test_prefers_full_window_match(self):
        """A period-1 cycle's adjacent match clips to one draft; the
        drafter must fall back to an older occurrence of the same bigram
        whose continuation holds all k (measured: without this, serving
        acceptance pinned at one draft/round on constant streams)."""
        h = [9, 4, 4, 4, 4, 4, 4]
        assert self._draft(h, cur=4, k=3).tolist() == [4, 4, 4]
        # period-2: full window from an earlier cycle repetition
        h2 = [5, 6, 5, 6, 5, 6, 5, 6]
        assert self._draft(h2, cur=6, k=3).tolist() == [5, 6, 5]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(11))
    out = tmp / "m.qtpu"
    from qwen3_rs_tpu.export import export_model

    export_model(model_dir, out, group_size=16, fmt="native")
    return out


@pytest.fixture(scope="module")
def engine(ckpt):
    return Engine(ckpt, mode="fast")


def _greedy_reference(engine, prompt, n):
    cache = engine.new_cache(1)
    logits, cache = engine.prefill(
        cache, np.asarray([prompt], np.int32), np.zeros(1, np.int32)
    )
    cur = int(np.argmax(np.asarray(logits)[0]))
    pos = len(prompt)
    toks, cache = engine.decode_chunk(cache, cur, pos, n, temperature=0.0)
    return [cur] + [int(t) for t in toks]


def _greedy_spec(engine, prompt, n_rounds, k):
    cache = engine.new_cache(1)
    logits, cache = engine.prefill(
        cache, np.asarray([prompt], np.int32), np.zeros(1, np.int32)
    )
    cur = int(np.argmax(np.asarray(logits)[0]))
    pos = len(prompt)
    history = np.asarray(list(prompt) + [cur], np.int32)
    toks, counts, cache = engine.decode_chunk_spec(
        cache, cur, pos, n_rounds, k, history
    )
    out = [cur]
    for r in range(n_rounds):
        out.extend(int(t) for t in toks[r, : counts[r]])
    return out, counts


@pytest.mark.parametrize("k", [2, 4])
def test_greedy_exact_parity(engine, k):
    """Speculative output must be token-for-token the plain greedy chunk
    output — acceptance shortcuts compute, never changes tokens."""
    prompt = [3, 5, 3, 5, 3, 7, 11, 2]
    n_rounds = 6
    spec, counts = _greedy_spec(engine, prompt, n_rounds, k)
    ref = _greedy_reference(engine, prompt, len(spec) - 1)
    assert spec == ref, (spec, ref, counts.tolist())
    # every round emits between 1 and k+1 tokens
    assert all(1 <= c <= k + 1 for c in counts.tolist())


def test_acceptance_on_repetitive_text(engine):
    """A model forced into a repeating loop must accept drafts (counts > 1
    at least once) — the tiny random model reliably falls into cycles."""
    prompt = [2, 9, 2, 9, 2, 9, 2, 9]
    spec, counts = _greedy_spec(engine, prompt, n_rounds=10, k=4)
    ref = _greedy_reference(engine, prompt, len(spec) - 1)
    assert spec == ref
    # Not guaranteed in theory, but with 10 rounds of a cyclic sequence the
    # bigram drafter should land at least one acceptance; if this ever
    # flakes the model isn't cycling and the assert below can be dropped.
    assert max(counts.tolist()) > 1, counts.tolist()


def test_generate_loop_spec_parity(ckpt, engine):
    """generate(spec_k=...) must print and return exactly the plain greedy
    device-loop output (EOS handling, metrics, streaming decode included)."""
    import io

    from qwen3_rs_tpu.inference import Tokenizer, TokenSampler, generate

    tokenizer = Tokenizer(ckpt, engine.config.vocab_size)

    def run(spec_k):
        sampler = TokenSampler(0.0, 0.9, seed=1, device=True)
        buf = io.StringIO()
        ids = generate(engine, tokenizer, sampler, "hello there", out=buf,
                       spec_k=spec_k)
        return ids, buf.getvalue()

    ids_ref, text_ref = run(0)
    ids_spec, text_spec = run(3)
    assert ids_spec == ids_ref
    assert text_spec == text_ref


class TestSpecRoundBatched:
    """spec_round_batched acceptance logic with a mocked forward — crafted
    logits make every outcome exact (no model float noise)."""

    V, K = 16, 2

    def _round(self, hist_rows, hlens, curs, temps, active, targets, pos):
        import jax

        b = len(curs)
        t = 12
        from qwen3_rs_tpu.inference.speculative import spec_round_batched

        targets = jnp.asarray(targets)  # [B, K+1] forced argmax per row

        def fake_fwd(weights, window, cache, pos, write_mask=None,
                     page_table=None, return_all_logits=False):
            logits = jax.nn.one_hot(targets, self.V) * 10.0
            return logits, cache

        hist = np.zeros((b, t), np.int32)
        for i, row in enumerate(hist_rows):
            hist[i, : len(row)] = row
        carry = (
            jnp.asarray(curs, jnp.int32),
            {"cache": 0},  # opaque pytree passthrough
            jnp.asarray(pos, jnp.int32),
            jnp.asarray(hist),
            jnp.asarray(hlens, jnp.int32),
            jnp.asarray(temps, jnp.float32),
            jnp.full((b,), 0.5, jnp.float32),  # nucleus keeps only the top-1
            jax.random.PRNGKey(0),
        )
        new_carry, (toks, counts) = spec_round_batched(
            fake_fwd, None, carry, self.K, None, jnp.asarray(active)
        )
        return new_carry, np.asarray(toks), np.asarray(counts)

    def test_full_and_zero_acceptance_mixed_inactive(self):
        # slot 0: hist [1,2,3,1,2], cur 2 → bigram (1,2) at j=1 → draft [3,1];
        #         preds [3,1,7] accept both → count 3, emits [3,1,7]
        # slot 1: hist [4,5,6,4,5], cur 5 → draft [6,4]; preds [9,6,6]:
        #         draft[0]=6 != preds[0]=9 → count 1, emits [9]
        # slot 2: temp 1.0, draft [7,8] from bigram (7,8); the one-hot·10 +
        #         topp 0.5 sampler deterministically picks target 8 at
        #         position 0, which mismatches draft 7 → count 1, emits [8]
        # slot 3: inactive → count 0, everything frozen
        (cur, _, pos, hist, hlen, _, _, _), toks, counts = self._round(
            hist_rows=[[1, 2, 3, 1, 2], [4, 5, 6, 4, 5], [7, 8, 7, 8], [0]],
            hlens=[5, 5, 4, 1],
            curs=[2, 5, 8, 0],
            temps=[0.0, 0.0, 1.0, 0.0],
            active=[True, True, True, False],
            targets=[[3, 1, 7], [9, 6, 6], [8, 2, 2], [5, 5, 5]],
            pos=[10, 20, 30, 0],
        )
        assert counts.tolist() == [3, 1, 1, 0]
        assert toks[0].tolist() == [3, 1, 7]
        assert toks[1, 0] == 9
        assert toks[2, 0] == 8
        assert np.asarray(cur).tolist() == [7, 9, 8, 0]
        assert np.asarray(pos).tolist() == [13, 21, 31, 0]
        assert np.asarray(hlen).tolist() == [8, 6, 5, 1]
        h = np.asarray(hist)
        assert h[0, :8].tolist() == [1, 2, 3, 1, 2, 3, 1, 7]
        assert h[1, :6].tolist() == [4, 5, 6, 4, 5, 9]
        assert h[2, :5].tolist() == [7, 8, 7, 8, 8]
        assert h[3, 0] == 0 and np.asarray(hlen)[3] == 1

    def test_partial_acceptance(self):
        # draft [3,1] vs preds [3,9,...]: first accepted, second rejected →
        # count 2, emits [3, 9] (accepted draft + bonus).
        (cur, _, pos, _, hlen, _, _, _), toks, counts = self._round(
            hist_rows=[[1, 2, 3, 1, 2]],
            hlens=[5],
            curs=[2],
            temps=[0.0],
            active=[True],
            targets=[[3, 9, 4]],
            pos=[7],
        )
        assert counts.tolist() == [2]
        assert toks[0, :2].tolist() == [3, 9]
        assert np.asarray(cur).tolist() == [9]
        assert np.asarray(pos).tolist() == [9]

    def test_no_draft_match_emits_one(self):
        # No bigram repeat in history → draft invalid (-1) → count 1.
        (cur, _, pos, _, _, _, _, _), toks, counts = self._round(
            hist_rows=[[1, 2, 3, 4]],
            hlens=[4],
            curs=[4],
            temps=[0.0],
            active=[True],
            targets=[[6, 6, 6]],
            pos=[4],
        )
        assert counts.tolist() == [1]
        assert toks[0, 0] == 6
        assert np.asarray(cur).tolist() == [6]
        assert np.asarray(pos).tolist() == [5]

    def test_sampled_slot_accepts_drafts(self):
        # temp 1.0 with one-hot·10 logits and topp 0.5: the nucleus keeps
        # only the target token, so sampling is deterministic — the slot
        # accepts like a greedy one.  hist [7,8,7,8], cur 8 → draft [7,8];
        # targets [7,8,5] → full acceptance, count 3.
        (cur, _, pos, _, hlen, _, _, _), toks, counts = self._round(
            hist_rows=[[7, 8, 7, 8]],
            hlens=[4],
            curs=[8],
            temps=[1.0],
            active=[True],
            targets=[[7, 8, 5]],
            pos=[30],
        )
        assert counts.tolist() == [3]
        assert toks[0].tolist() == [7, 8, 5]
        assert np.asarray(cur).tolist() == [5]
        assert np.asarray(pos).tolist() == [33]
        assert np.asarray(hlen).tolist() == [7]


class TestStochasticSpecExactness:
    """The sampled-acceptance path must keep the plain autoregressive
    sampling distribution exactly (speculative sampling with a
    deterministic drafter).  Mocked forward, small vocab, many PRNG keys:
    the empirical law of the emitted tokens matches the analytic chain."""

    def test_joint_distribution_matches_chain(self):
        import jax
        from qwen3_rs_tpu.inference.speculative import spec_round_batched

        v, k = 4, 1
        # hist [1,2,1,2], cur 2 → bigram (1,2) at j=1 → draft [1].
        d = 1
        p0_logits = jnp.asarray([0.3, 0.9, -0.2, 0.1], jnp.float32)
        # Position-1 logits depend on the window's second token — verifies
        # the conditioning, not just the marginals.
        p1_matrix = jnp.asarray(
            [
                [0.0, 0.5, 1.0, -0.5],
                [1.2, -0.3, 0.4, 0.0],
                [-1.0, 0.2, 0.2, 0.6],
                [0.5, 0.5, -0.8, 0.3],
            ],
            jnp.float32,
        )

        def fake_fwd(weights, window, cache, pos, write_mask=None,
                     page_table=None, return_all_logits=False):
            l0 = jnp.broadcast_to(p0_logits, (window.shape[0], v))
            l1 = p1_matrix[window[:, 1]]
            return jnp.stack([l0, l1], axis=1), cache

        hist = jnp.asarray([[1, 2, 1, 2, 0, 0, 0, 0]], jnp.int32)

        def one_round(key):
            carry = (
                jnp.asarray([2], jnp.int32),
                {"cache": 0},
                jnp.asarray([0], jnp.int32),
                hist,
                jnp.asarray([4], jnp.int32),
                jnp.ones(1, jnp.float32),  # temp 1
                jnp.full(1, 2.0, jnp.float32),  # topp outside (0,1) → plain
                key,
            )
            _, (toks, counts) = spec_round_batched(
                fake_fwd, None, carry, k, None, jnp.asarray([True])
            )
            return toks[0], counts[0]

        n = 8192
        keys = jax.random.split(jax.random.PRNGKey(7), n)
        toks, counts = jax.jit(jax.vmap(one_round))(keys)
        toks, counts = np.asarray(toks), np.asarray(counts)

        p0 = np.asarray(jax.nn.softmax(p0_logits))
        p1_d = np.asarray(jax.nn.softmax(p1_matrix[d]))
        se = lambda p: 4.0 * np.sqrt(p * (1 - p) / n) + 1e-3  # 4σ

        # First emitted token ~ p0 exactly (accepted or corrected).
        for x in range(v):
            f = np.mean(toks[:, 0] == x)
            assert abs(f - p0[x]) < se(p0[x]), (x, f, p0[x])
        # Acceptance probability = p0(draft).
        acc = counts == 2
        assert abs(np.mean(acc) - p0[d]) < se(p0[d])
        # Conditioned on acceptance, the bonus token ~ p1(· | prefix=d).
        sel = toks[acc, 1]
        for y in range(v):
            f = np.mean(sel == y)
            assert abs(f - p1_d[y]) < 4.0 * np.sqrt(
                p1_d[y] * (1 - p1_d[y]) / max(len(sel), 1)
            ) + 1e-3, (y, f, p1_d[y])
