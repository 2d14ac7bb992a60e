"""Ring attention (context parallelism) vs single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from qwen3_rs_tpu.ops.attention import gqa_attention_xla
from qwen3_rs_tpu.parallel.context import SP_AXIS, ring_prefill_attention


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), (SP_AXIS,))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_matches_single_device(rng, n_shards):
    b, s, n_kv, kv_mul, hd = 2, 64, 2, 2, 64
    n_heads = n_kv * kv_mul
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    k = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    v = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)

    out = np.asarray(
        ring_prefill_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), _mesh(n_shards)
        )
    )
    # Reference: dense causal attention over the fully-written sequence
    # (cache layout [B, kv, T, hd], q_pos = absolute row indices).
    ref = np.asarray(
        gqa_attention_xla(
            jnp.asarray(q),
            jnp.asarray(np.transpose(k, (0, 2, 1, 3))),
            jnp.asarray(np.transpose(v, (0, 2, 1, 3))),
            jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s)),
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_uneven_sequence_rejected(rng):
    b, s, n_heads, hd = 1, 30, 2, 64
    q = jnp.zeros((b, s, n_heads, hd))
    k = jnp.zeros((b, s, 2, hd))
    with pytest.raises(ValueError, match="divide"):
        ring_prefill_attention(q, k, k, _mesh(4))


def test_jit_compiles_under_mesh(rng):
    """The ring body must be jittable (static ppermute schedule) — the form
    a model-level integration would trace."""
    b, s, n_kv, kv_mul, hd = 1, 32, 2, 2, 64
    n_heads = n_kv * kv_mul
    mesh = _mesh(4)
    q = jnp.asarray(rng.normal(0, 1, (b, s, n_heads, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, s, n_kv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, s, n_kv, hd)), jnp.float32)

    fn = jax.jit(lambda a, b_, c: ring_prefill_attention(a, b_, c, mesh))
    out = np.asarray(fn(q, k, v))
    ref = np.asarray(
        gqa_attention_xla(
            q,
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (1, s)),
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_engine_sp_prefill_matches_single_device(rng):
    """Engine-level ring-attention prefill (sp mesh) produces the same
    logits as the plain single-device fresh prefill (VERDICT r1 #10)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from test_model_parity import make_weights
    from utils import TINY_CONFIG

    from qwen3_rs_tpu.inference.engine import Engine
    from qwen3_rs_tpu.parallel.context import SP_AXIS

    _, weights = make_weights(TINY_CONFIG, rng)
    prompt = np.asarray([[5, 9, 3, 11, 2, 7, 8, 1, 4, 6, 10, 12, 13, 14, 15, 16]],
                        np.int32)
    pos = np.zeros(1, np.int32)

    base = Engine(config=TINY_CONFIG, weights=weights)
    want, _ = base.prefill(base.new_cache(), prompt, pos)

    mesh = Mesh(np.asarray(jax.devices()[:4]), (SP_AXIS,))
    eng = Engine(config=TINY_CONFIG, weights=weights, sp_mesh=mesh, sp_threshold=8)
    got, got_cache = eng.prefill(eng.new_cache(), prompt, pos)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # And decode continues correctly from the sp-prefilled cache.
    logits2, _ = eng.decode_step(
        got_cache, jnp.asarray([3], jnp.int32), jnp.asarray([16], jnp.int32)
    )
    base_logits2, _ = base.decode_step(
        (base.prefill(base.new_cache(), prompt, pos))[1],
        jnp.asarray([3], jnp.int32),
        jnp.asarray([16], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(base_logits2), rtol=2e-4, atol=2e-4
    )
