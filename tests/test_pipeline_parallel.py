"""Pipeline parallelism (GPipe schedule) vs the single-device forward."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
from qwen3_rs_tpu.parallel.pipeline import (
    PP_AXIS,
    create_pp_mesh,
    pipelined_forward,
    shard_for_pp,
    validate_pp,
)


@pytest.fixture(scope="module")
def setup():
    config = dataclasses.replace(TINY_CONFIG, n_layers=8).validate()
    rng = np.random.default_rng(11)
    _, weights = make_weights(config, rng)
    return config, weights


def _tokens(config, rng, b, s):
    return jnp.asarray(rng.integers(0, config.vocab_size, (b, s)), jnp.int32)


@pytest.mark.parametrize("pp,m", [(2, 2), (4, 4), (4, 2), (8, 4)])
def test_prefill_matches_single_device(setup, rng, pp, m):
    config, weights = setup
    b, s = 4, 8
    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, b), pos, mode="f32"
    )
    pp_logits, pp_cache = pipelined_forward(
        config, weights, tokens, init_kv_cache(config, b), pos,
        create_pp_mesh(pp), n_microbatches=m, mode="f32",
    )
    np.testing.assert_allclose(pp_logits, ref_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pp_cache.k), np.asarray(ref_cache.k), rtol=2e-4, atol=2e-4
    )


def test_decode_chain_matches(setup, rng):
    """Prefill then two decode steps through the pipeline track the
    single-device engine (cache state carried across steps).

    n_microbatches=2 keeps the attention batch shape's XLA reduction tiling
    compatible with the reference run; at microbatch size 1 the cache-prefix
    einsum reduces with a different tiling and ulp-level f32 differences get
    amplified through the bf16 residual on tiny random models (see the
    loose-tolerance test below).
    """
    config, weights = setup
    mesh = create_pp_mesh(4)
    b, s = 4, 6
    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)

    ref_cache = init_kv_cache(config, b)
    pp_cache = init_kv_cache(config, b)
    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, ref_cache, pos, mode="f32"
    )
    pp_logits, pp_cache = pipelined_forward(
        config, weights, tokens, pp_cache, pos, mesh, n_microbatches=2, mode="f32"
    )
    for step in range(2):
        nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)[:, None]
        p = jnp.full(b, s + step, jnp.int32)
        ref_logits, ref_cache = qwen3_forward(
            config, weights, nxt, ref_cache, p, mode="f32"
        )
        pp_logits, pp_cache = pipelined_forward(
            config, weights, nxt, pp_cache, p, mesh, n_microbatches=2, mode="f32"
        )
        np.testing.assert_allclose(pp_logits, ref_logits, rtol=2e-4, atol=2e-4)


def test_decode_microbatch_one_close(setup, rng):
    """Full-depth microbatching (mbs=1) on a decode step: same math, but the
    batch-1 attention reduction tiles differently on CPU — loose tolerance."""
    config, weights = setup
    b, s = 4, 6
    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)
    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, b), pos, mode="f32"
    )
    nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)[:, None]
    p = jnp.full(b, s, jnp.int32)
    ref2, _ = qwen3_forward(config, weights, nxt, ref_cache, p, mode="f32")
    out2, _ = pipelined_forward(
        config, weights, nxt, jax.device_get(ref_cache), p,
        create_pp_mesh(4), n_microbatches=4, mode="f32",
    )
    np.testing.assert_allclose(out2, ref2, rtol=0.05, atol=0.03)


def test_fast_mode_close(setup, rng):
    config, weights = setup
    b, s = 4, 8
    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)
    ref, _ = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, b), pos, mode="fast"
    )
    out, _ = pipelined_forward(
        config, weights, tokens, init_kv_cache(config, b), pos,
        create_pp_mesh(4), mode="fast",
    )
    # Same bf16 math, different reduction grouping across the residual chain.
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_all_logits_and_validation(setup, rng):
    config, weights = setup
    b, s = 2, 4
    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)
    ref, _ = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, b), pos,
        mode="f32", return_all_logits=True,
    )
    out, _ = pipelined_forward(
        config, weights, tokens, init_kv_cache(config, b), pos,
        create_pp_mesh(2), mode="f32", return_all_logits=True,
    )
    assert out.shape == (b, s, config.vocab_size)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError, match="divide"):
        validate_pp(config, 3, b, 2)
    with pytest.raises(ValueError, match="microbatch"):
        validate_pp(config, 2, 3, 2)
    with pytest.raises(ValueError, match="exceeds"):
        create_pp_mesh(pp=99)


def test_shard_for_pp_placement_and_forward(setup, rng):
    """shard_for_pp splits every layer-stacked leaf over pp (and replicates
    the rest); the pipeline runs on the pre-sharded pytrees unchanged."""
    config, weights = setup
    mesh = create_pp_mesh(4)
    b, s = 4, 8
    cache = init_kv_cache(config, b)
    w_sh, c_sh = shard_for_pp(weights, cache, mesh)

    def axis0_sharded(x):
        spec = x.sharding.spec
        return len(spec) > 0 and spec[0] == PP_AXIS

    assert all(axis0_sharded(l) for l in jax.tree.leaves(w_sh.layers))
    assert all(axis0_sharded(l) for l in jax.tree.leaves(c_sh))
    assert w_sh.rms_final.sharding.is_fully_replicated
    assert w_sh.embed.q.sharding.is_fully_replicated

    tokens = _tokens(config, rng, b, s)
    pos = jnp.zeros(b, jnp.int32)
    ref, _ = qwen3_forward(config, weights, tokens, cache, pos, mode="f32")
    out, _ = pipelined_forward(config, w_sh, tokens, c_sh, pos, mesh, mode="f32")
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
