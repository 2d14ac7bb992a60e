"""Sampler parity tests: the xorshift64* stream and every sampling branch
must match the reference semantics (qwen3-inference/src/sampler.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_rs_tpu.ops.sampling import (
    Sampler,
    XorshiftRng,
    sample_tokens_jax,
    softmax_f32,
)


def _ref_xorshift_u32(state: int) -> tuple[int, int]:
    """Pure-python big-int model of sampler.rs:44-49."""
    mask = (1 << 64) - 1
    state ^= state >> 12
    state = (state ^ (state << 25)) & mask
    state ^= state >> 27
    return ((state * 0x2545F4914F6CDD1D) & mask) >> 32, state


class TestXorshift:
    def test_sequence_matches_pure_python(self):
        rng = XorshiftRng(42)
        state = 42
        for _ in range(100):
            expected, state = _ref_xorshift_u32(state)
            assert rng.random_u32() == expected

    def test_random_f32_range_and_value(self):
        rng = XorshiftRng(123456789)
        state = 123456789
        for _ in range(50):
            expected_u32, state = _ref_xorshift_u32(state)
            expected = np.float32(expected_u32 >> 8) / np.float32(16777216.0)
            got = rng.random_f32()
            assert got == expected
            assert 0.0 <= got < 1.0

    def test_large_seed(self):
        rng = XorshiftRng(2**63 + 12345)
        for _ in range(10):
            assert 0 <= rng.random_u32() < 2**32


class TestSampler:
    def test_greedy_argmax(self):
        s = Sampler(0.0, 0.9, 1)
        logits = np.array([0.1, 5.0, 0.2], np.float32)
        assert s.sample(logits) == 1

    def test_greedy_tie_takes_last(self):
        # Rust Iterator::max_by returns the LAST maximal element.
        s = Sampler(0.0, 0.9, 1)
        logits = np.array([5.0, 1.0, 5.0, 2.0], np.float32)
        assert s.sample(logits) == 2

    def test_multinomial_cdf_walk(self):
        # topp=1.0 disables nucleus → plain CDF walk with one coin.
        s = Sampler(1.0, 1.0, 7)
        rng_copy = XorshiftRng(7)
        logits = np.array([1.0, 2.0, 3.0, 0.5], np.float32)
        probs = softmax_f32(logits / np.float32(1.0))
        coin = rng_copy.random_f32()
        cdf = 0.0
        expected = len(probs) - 1
        for i, p in enumerate(probs):
            cdf += p
            if coin < cdf:
                expected = i
                break
        assert s.sample(logits.copy()) == expected

    def test_topp_deterministic_per_seed(self):
        logits = np.random.default_rng(3).normal(0, 2, 100).astype(np.float32)
        a = [Sampler(0.8, 0.9, 42).sample(logits.copy()) for _ in range(1)][0]
        b = [Sampler(0.8, 0.9, 42).sample(logits.copy()) for _ in range(1)][0]
        assert a == b

    def test_topp_respects_nucleus(self):
        # One dominant token (p > topp) → always chosen.
        s = Sampler(1.0, 0.5, 99)
        logits = np.zeros(10, np.float32)
        logits[4] = 20.0
        for _ in range(20):
            assert s.sample(logits.copy()) == 4

    def test_topp_cutoff_excludes_tiny_probs(self):
        # Tokens below (1-topp)/(n-1) can never be selected (sampler.rs:75).
        n = 5
        topp = 0.6
        s = Sampler(1.0, topp, 1234)
        logits = np.array([10.0, 10.0, -30.0, -30.0, -30.0], np.float32)
        for _ in range(50):
            assert s.sample(logits.copy()) in (0, 1)

    def test_invalid_params(self):
        with pytest.raises(ValueError):
            Sampler(-1.0, 0.9, 1)
        with pytest.raises(ValueError):
            Sampler(1.0, 1.5, 1)

    def test_temperature_scaling_changes_distribution(self):
        logits = np.array([1.0, 1.1], np.float32)
        counts_hot = sum(
            Sampler(5.0, 1.0, seed).sample(logits.copy()) for seed in range(200)
        )
        counts_cold = sum(
            Sampler(0.05, 1.0, seed).sample(logits.copy()) for seed in range(200)
        )
        # Cold temperature concentrates on token 1; hot is closer to uniform.
        assert counts_cold > counts_hot


class TestDeviceSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.0, 3.0, 1.0], [9.0, 0.0, 1.0]])
        out = sample_tokens_jax(logits, jax.random.PRNGKey(0), 0.0, 0.9)
        np.testing.assert_array_equal(np.asarray(out), [1, 0])

    def test_topp_nucleus_mask(self):
        logits = jnp.asarray([[20.0, 0.0, 0.0, 0.0]])
        for seed in range(10):
            out = sample_tokens_jax(logits, jax.random.PRNGKey(seed), 1.0, 0.5)
            assert int(out[0]) == 0

    def test_batched_shape(self):
        logits = jnp.zeros((4, 16))
        out = sample_tokens_jax(logits, jax.random.PRNGKey(0), 1.0, 0.9)
        assert out.shape == (4,)


class TestDeviceSamplingLargeVocab:
    """The V > 2*_NUCLEUS_TOPK path (ApproxTopK prefilter, full-vocab
    normalization) must still confine samples to the exact nucleus."""

    def test_nucleus_containment(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 3)
        seen = [set(), set()]
        for s in range(100):
            out = np.asarray(
                sample_tokens_jax(logits, jax.random.PRNGKey(s), 1.0, 0.9)
            )
            for b in range(2):
                seen[b].add(int(out[b]))
        sc = np.asarray(logits, np.float64)
        for b in range(2):
            p = np.exp(sc[b] - sc[b].max())
            p /= p.sum()
            order = np.argsort(-p)
            cum = np.cumsum(p[order])
            nucleus = set(order[: int(np.searchsorted(cum, 0.9) + 1)].tolist())
            assert seen[b] <= nucleus

    def test_greedy_large_vocab(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((3, 2048)).astype(np.float32))
        out = sample_tokens_jax(logits, jax.random.PRNGKey(0), 0.0, 0.9)
        np.testing.assert_array_equal(
            np.asarray(out), np.argmax(np.asarray(logits), axis=-1)
        )


class TestArgmaxTieParity:
    def test_device_greedy_matches_host_on_ties(self):
        """Device greedy sampling must resolve ties to the LAST max index,
        like the host sampler / Rust's Iterator::max_by (sampler.rs:57-59)."""
        import jax
        import jax.numpy as jnp

        from qwen3_rs_tpu.ops.sampling import (
            Sampler,
            argmax_last_jax,
            sample_tokens_jax,
        )

        logits = np.zeros((1, 7), np.float32)
        logits[0, [1, 4, 5]] = 3.0  # three-way tie → index 5
        host = Sampler(0.0, 0.9, seed=1).sample(logits[0])
        dev = sample_tokens_jax(jnp.asarray(logits), jax.random.PRNGKey(0), 0.0, 0.9)
        assert host == 5
        assert int(dev[0]) == 5
        assert int(argmax_last_jax(jnp.asarray(logits))[0]) == 5
        # Per-request param form takes the same greedy path.
        dev_b = sample_tokens_jax(
            jnp.asarray(logits),
            jax.random.PRNGKey(0),
            jnp.zeros(1),
            jnp.full(1, 0.9),
        )
        assert int(dev_b[0]) == 5
