"""Multi-device sharding tests on the virtual 8-CPU mesh: TP/DP-sharded
prefill+decode must reproduce single-device results exactly (same math, just
distributed)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
from qwen3_rs_tpu.parallel.mesh import DP_AXIS, TP_AXIS, create_mesh
from qwen3_rs_tpu.parallel.sharding import (
    cache_pspecs,
    shard_cache,
    shard_weights,
    validate_tp,
    weight_pspecs,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    config = TINY_CONFIG  # n_heads=4, n_kv=2, hidden=128, dim=64, g=16
    _, weights = make_weights(config, rng)
    return config, weights


def _run(config, weights, cache, tokens, pos):
    return qwen3_forward(config, weights, tokens, cache, pos, mode="fast")


class TestMesh:
    def test_create_shapes(self):
        mesh = create_mesh(tp=4, dp=2)
        assert mesh.shape == {DP_AXIS: 2, TP_AXIS: 4}

    def test_default_all_tp(self):
        mesh = create_mesh()
        assert mesh.shape[TP_AXIS] == 8
        assert mesh.shape[DP_AXIS] == 1

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            create_mesh(tp=3, dp=2)


class TestValidateTp:
    def test_ok(self):
        validate_tp(TINY_CONFIG, 2)

    def test_bad_heads(self):
        with pytest.raises(ValueError):
            validate_tp(TINY_CONFIG, 3)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (1, 1), (2, 1)])
def test_sharded_matches_single_device(setup, dp, tp):
    config, weights = setup
    batch = 2 * max(dp, 1)
    tokens = np.arange(batch * 4, dtype=np.int32).reshape(batch, 4) % config.vocab_size
    pos0 = np.zeros(batch, np.int32)

    # Single-device baseline.
    cache0 = init_kv_cache(config, batch)
    base_logits, base_cache = _run(
        config, weights, cache0, jnp.asarray(tokens), jnp.asarray(pos0)
    )

    mesh = create_mesh(tp=tp, dp=dp, devices=jax.devices()[: dp * tp])
    w_sharded = shard_weights(weights, mesh, config)
    cache = shard_cache(init_kv_cache(config, batch), mesh)
    data_sharding = NamedSharding(mesh, P(DP_AXIS, None))

    step = jax.jit(
        functools.partial(qwen3_forward, config, mode="fast"),
        in_shardings=(
            jax.tree.map(lambda s: NamedSharding(mesh, s), weight_pspecs(config)),
            data_sharding,
            jax.tree.map(lambda s: NamedSharding(mesh, s), cache_pspecs()),
            NamedSharding(mesh, P(DP_AXIS)),
        ),
    )
    logits, new_cache = step(
        w_sharded,
        jax.device_put(jnp.asarray(tokens), data_sharding),
        cache,
        jax.device_put(jnp.asarray(pos0), NamedSharding(mesh, P(DP_AXIS))),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(base_logits), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(base_cache.k), rtol=1e-4, atol=1e-4
    )

    # Decode step on the sharded cache.
    next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    pos1 = jnp.full(batch, 4, jnp.int32)
    logits2, _ = step(
        w_sharded,
        jax.device_put(next_tok, data_sharding),
        new_cache,
        jax.device_put(pos1, NamedSharding(mesh, P(DP_AXIS))),
    )
    base_logits2, _ = _run(config, weights, base_cache, next_tok, pos1)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(base_logits2), rtol=5e-3, atol=5e-3
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_tiny():
    import os

    os.environ["GRAFT_ENTRY_LAYERS"] = "2"
    try:
        import __graft_entry__ as ge

        fn, args = ge.entry()
        logits, cache = jax.jit(fn)(*args)
        assert logits.shape[0] == 1
        assert np.isfinite(np.asarray(logits)).all()
    finally:
        del os.environ["GRAFT_ENTRY_LAYERS"]


@pytest.mark.parametrize("tp", [1, 2])
def test_paged_sharded_matches_single_device(setup, tp):
    """Paged-pool decode under a tp-sharded mesh (pool kv-heads on tp) must
    match the unsharded paged forward."""
    config, weights = setup
    from qwen3_rs_tpu.serving.paged_cache import init_paged_cache

    page, n_pages = 8, 6
    b = 2
    tables = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    pos = jnp.asarray([12, 5], jnp.int32)
    tokens = jnp.asarray([[7], [9]], jnp.int32)

    def fill(cache):
        k = jax.random.normal(jax.random.PRNGKey(0), cache.k.shape, cache.k.dtype)
        v = jax.random.normal(jax.random.PRNGKey(1), cache.v.shape, cache.v.dtype)
        return cache._replace(k=k, v=v)

    base_cache = fill(init_paged_cache(config, n_pages, page))
    base_logits, base_new = qwen3_forward(
        config, weights, tokens, base_cache, pos, mode="fast", page_table=tables
    )

    mesh = create_mesh(tp=tp, dp=1, devices=jax.devices()[: tp])
    w_sh = shard_weights(weights, mesh, config)
    pool_spec = P(None, None, TP_AXIS, None, None)  # [L, P, kv, page, hd]
    cache_sh = jax.device_put(
        fill(init_paged_cache(config, n_pages, page)),
        NamedSharding(mesh, pool_spec),
    )
    step = jax.jit(
        functools.partial(qwen3_forward, config, mode="fast"),
        donate_argnums=(2,),
        static_argnames=(),
    )
    logits, new_cache = step(w_sh, tokens, cache_sh, pos, page_table=tables)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(base_logits), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(base_new.k), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("dp,tp", [(2, 2)])
def test_sharded_bounded_attention_window(setup, dp, tp):
    """A cache window large enough to engage the position-bounded fori_loop
    attention path (T >= 512) must compile and match under a (dp, tp) mesh —
    the loop bound is a max over the dp-sharded positions."""
    config, weights = setup
    import dataclasses

    config = dataclasses.replace(config, seq_len=512).validate()
    mesh = create_mesh(tp=tp, dp=dp, devices=jax.devices()[: dp * tp])
    batch = 2 * dp

    tokens = jnp.arange(batch, dtype=jnp.int32)[:, None] % config.vocab_size
    pos = jnp.asarray([130, 64, 0, 300], jnp.int32)[:batch]

    base_cache = init_kv_cache(config, batch, dtype=jnp.bfloat16)
    base_logits, _ = qwen3_forward(
        config, weights, tokens, base_cache, pos, mode="fast"
    )

    from qwen3_rs_tpu.ops.attention import _pick_cache_chunk

    assert _pick_cache_chunk(config.seq_len) is not None  # loop path engaged

    w_sh = shard_weights(weights, mesh, config)
    cache_sh = shard_cache(init_kv_cache(config, batch, dtype=jnp.bfloat16), mesh)
    data_sh = NamedSharding(mesh, P(DP_AXIS, None))
    step = jax.jit(
        functools.partial(qwen3_forward, config, mode="fast"), donate_argnums=(2,)
    )
    logits, _ = step(
        w_sh,
        jax.device_put(tokens, data_sh),
        cache_sh,
        jax.device_put(pos, NamedSharding(mesh, P(DP_AXIS))),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(base_logits), rtol=5e-3, atol=5e-3
    )


@pytest.mark.parametrize("tp", [2])
def test_int4_sharded_matches_single_device(setup, tp):
    """INT4 (nibble-packed) weights shard over tp with the same pspecs: the
    packed in axis stays group-aligned at shard boundaries."""
    config, weights = setup
    from qwen3_rs_tpu.ops.quant import Q4Tensor, pack_q4_np, quantize_weights_q4_np

    rng = np.random.default_rng(5)
    g = config.group_size

    def q4_stack(in_dim, out_dim):
        w = rng.normal(0, 0.08, (config.n_layers, out_dim, in_dim)).astype(np.float32)
        q, s, _ = quantize_weights_q4_np(w, g)
        qT = np.ascontiguousarray(np.swapaxes(q, 1, 2))
        sT = np.ascontiguousarray(np.swapaxes(s, 1, 2))
        return Q4Tensor(jnp.asarray(pack_q4_np(qT, g)), jnp.asarray(sT))

    c = config
    w4 = weights._replace(
        layers=weights.layers._replace(
            wqkv=q4_stack(c.dim, c.all_heads_dim + 2 * c.kv_dim),
            wo=q4_stack(c.all_heads_dim, c.dim),
            w13=q4_stack(c.dim, 2 * c.hidden_dim),
            w2=q4_stack(c.hidden_dim, c.dim),
        )
    )

    tokens = jnp.asarray([[3, 7, 1, 9], [2, 8, 4, 6]], jnp.int32)
    pos0 = jnp.zeros(2, jnp.int32)
    cache0 = init_kv_cache(config, 2)
    base_logits, _ = _run(config, w4, cache0, tokens, pos0)

    mesh = create_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    w_sharded = shard_weights(w4, mesh, config)
    cache = shard_cache(init_kv_cache(config, 2), mesh)
    logits, _ = jax.jit(functools.partial(qwen3_forward, config, mode="fast"))(
        w_sharded, tokens, cache, pos0
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(base_logits), rtol=5e-3, atol=5e-3
    )
