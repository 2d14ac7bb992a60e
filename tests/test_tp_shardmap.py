"""shard_map tensor parallelism: per-shard-local forward with explicit
psums matches the single-device forward, and the Pallas kernel path
engages inside the shards (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from test_model_parity import make_weights
from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
from qwen3_rs_tpu.parallel.mesh import TP_AXIS
from qwen3_rs_tpu.parallel.tp import (
    interleave_for_tp,
    make_tp_forward,
    shard_cache_tp,
    shard_weights_tp,
)

CONFIG = ModelConfig(
    architecture_id=ARCHITECTURE_QWEN3,
    dim=64,
    hidden_dim=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=4,
    head_dim=16,
    seq_len=64,
    vocab_size=96,
    group_size=16,
    shared_classifier=True,
)


def tp_mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]).reshape(tp), (TP_AXIS,))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    _, weights = make_weights(CONFIG, rng)
    return weights


@pytest.mark.parametrize("tp", [2, 4])
def test_matches_single_device(setup, tp):
    weights = setup
    mesh = tp_mesh(tp)
    batch = 2
    tokens = jnp.asarray([[5, 9, 3], [11, 2, 7]], jnp.int32)
    pos = jnp.asarray([0, 0], jnp.int32)

    cache = init_kv_cache(CONFIG, batch=batch)
    ref_logits, ref_cache = qwen3_forward(
        CONFIG, weights, tokens, cache, pos, mode="fast", return_all_logits=True
    )

    fwd = make_tp_forward(CONFIG, mesh)
    w_tp = shard_weights_tp(weights, mesh, CONFIG)
    c_tp = shard_cache_tp(init_kv_cache(CONFIG, batch=batch), mesh)
    out_logits, out_cache = fwd(w_tp, tokens, c_tp, pos, return_all_logits=True)

    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_cache.k), np.asarray(ref_cache.k), rtol=2e-4, atol=2e-4
    )


def test_decode_steps_match(setup):
    """Prefill + several decode steps through the tp forward track the
    single-device token stream exactly (greedy)."""
    weights = setup
    tp = 4
    mesh = tp_mesh(tp)
    tokens0 = jnp.asarray([[5, 9, 3, 11]], jnp.int32)

    def run(fwd, weights, cache):
        logits, cache = fwd(weights, tokens0, cache, jnp.asarray([0], jnp.int32))
        toks = [int(jnp.argmax(logits[0]))]
        for i in range(4):
            logits, cache = fwd(
                weights,
                jnp.asarray([[toks[-1]]], jnp.int32),
                cache,
                jnp.asarray([4 + i], jnp.int32),
            )
            toks.append(int(jnp.argmax(logits[0])))
        return toks

    def base_fwd(w, t, c, p, **kw):
        return qwen3_forward(CONFIG, w, t, c, p, mode="fast", **kw)

    want = run(base_fwd, weights, init_kv_cache(CONFIG, batch=1))
    fwd = make_tp_forward(CONFIG, mesh)
    got = run(
        fwd,
        shard_weights_tp(weights, mesh, CONFIG),
        shard_cache_tp(init_kv_cache(CONFIG, batch=1), mesh),
    )
    assert got == want


def test_paged_forward_matches(setup):
    """Paged-pool decode through shard_map (pool kv-head sharded) matches
    the single-device paged forward — the kernel no longer needs the
    allow_paged_flash=False gate in this path."""
    from qwen3_rs_tpu.serving.paged_cache import init_paged_cache

    weights = setup
    mesh = tp_mesh(2)
    cache = init_paged_cache(CONFIG, n_pages=6, page_size=8)
    tables = jnp.asarray([[1, 2, 0], [3, 4, 0]], jnp.int32)
    pos = jnp.asarray([10, 3], jnp.int32)
    tokens = jnp.asarray([[7], [9]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        CONFIG, weights, tokens, cache, pos, mode="fast", page_table=tables
    )
    fwd = make_tp_forward(CONFIG, mesh)
    out_logits, out_cache = fwd(
        shard_weights_tp(weights, mesh, CONFIG),
        tokens,
        shard_cache_tp(cache, mesh),
        pos,
        page_table=tables,
    )
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_cache.k), np.asarray(ref_cache.k), rtol=2e-4, atol=2e-4
    )


def test_kernel_path_engages_in_shards(setup, monkeypatch):
    """Inside shard_map the fused Pallas kernels see local shapes and run
    (interpret mode) — tp parity no longer requires gating kernels off."""
    import qwen3_rs_tpu.ops.pallas as pallas_pkg
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_fused

    config = ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        dim=256,
        hidden_dim=512,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=128,
        seq_len=64,
        vocab_size=96,
        group_size=64,
        shared_classifier=True,
    )
    rng = np.random.default_rng(7)
    _, weights = make_weights(config, rng)
    tp = 2
    mesh = tp_mesh(tp)
    tokens = jnp.asarray([[5]], jnp.int32)
    pos = jnp.asarray([0], jnp.int32)

    ref_logits, _ = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, batch=1), pos, mode="fast"
    )

    calls = {"n": 0}

    def fused_interp(x, w, idx, **kw):
        calls["n"] += 1
        return qmatmul_pallas_stacked_fused(x, w, idx, interpret=True, **kw)

    monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
    monkeypatch.setattr(pallas_pkg, "qmatmul_pallas_stacked_fused", fused_interp)

    fwd = make_tp_forward(config, mesh)
    out_logits, _ = fwd(
        shard_weights_tp(weights, mesh, config),
        tokens,
        shard_cache_tp(init_kv_cache(config, batch=1), mesh),
        pos,
    )
    assert calls["n"] == 4  # all four projections ran the kernel per shard
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=0.0, atol=0.25
    )


def test_collective_matmul_overlap_parity(monkeypatch):
    """With overlap forced on (chunked row-parallel projections, one psum
    per chunk), the tp prefill matches the single-device forward — the
    chunked psum path reassembles exactly."""
    config = ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        dim=256,
        hidden_dim=512,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        seq_len=64,
        vocab_size=96,
        group_size=32,
        shared_classifier=True,
    ).validate()
    rng = np.random.default_rng(11)
    _, weights = make_weights(config, rng)
    tokens = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8) % 96)
    pos = jnp.zeros(2, jnp.int32)

    ref_logits, _ = qwen3_forward(
        config, weights, tokens, init_kv_cache(config, batch=2), pos,
        mode="fast", return_all_logits=True,
    )

    monkeypatch.setenv("QWEN3_TPU_TP_OVERLAP_MIN_ROWS", "1")
    monkeypatch.setenv("QWEN3_TPU_TP_OVERLAP_CHUNKS", "2")  # dim=256 → 2×128
    mesh = tp_mesh(2)
    fwd = make_tp_forward(config, mesh)
    out_logits, _ = fwd(
        shard_weights_tp(weights, mesh, config),
        tokens,
        shard_cache_tp(init_kv_cache(config, batch=2), mesh),
        pos,
        return_all_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_interleave_roundtrip(setup):
    """Interleaved wqkv columns concatenated across shards reproduce the
    per-shard q|k|v layout."""
    weights = setup
    tp = 2
    inter = interleave_for_tp(weights, CONFIG, tp)
    ah, kvd = CONFIG.all_heads_dim, CONFIG.kv_dim
    w = np.asarray(weights.layers.wqkv.q)
    wi = np.asarray(inter.layers.wqkv.q)
    shard_w = (ah + 2 * kvd) // tp
    for t in range(tp):
        local = wi[..., t * shard_w : (t + 1) * shard_w]
        q_t = w[..., t * ah // tp : (t + 1) * ah // tp]
        k_t = w[..., ah + t * kvd // tp : ah + (t + 1) * kvd // tp]
        v_t = w[..., ah + kvd + t * kvd // tp : ah + kvd + (t + 1) * kvd // tp]
        np.testing.assert_array_equal(
            local, np.concatenate([q_t, k_t, v_t], axis=-1)
        )
