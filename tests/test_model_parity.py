"""End-to-end model parity: the jitted JAX forward in ``exact`` mode vs the
numpy reference engine (a 1:1 translation of the Rust semantics), token by
token through a KV-cached autoregressive run."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ref_engine import RefQwen3
from utils import TINY_CONFIG

from qwen3_rs_tpu.models.qwen3 import (
    Qwen3LayerWeights,
    Qwen3Weights,
    init_kv_cache,
    qwen3_forward,
)
from qwen3_rs_tpu.ops.quant import QuantizedTensor, quantize_weights_np


def make_weights(config, rng, scale=0.08):
    """Random quantized weights in both numpy-dict and pytree forms."""
    c = config
    g = c.group_size

    def qw(*shape):
        w = rng.normal(0, scale, shape).astype(np.float32)
        q, s, _ = quantize_weights_np(w, g)
        return q, s

    def norm(*shape):
        return rng.normal(1, 0.05, shape).astype(np.float32)

    np_w = {}
    np_w["embed.q"], np_w["embed.s"] = qw(c.vocab_size, c.dim)
    np_w["rms_att"] = norm(c.n_layers, c.dim)
    np_w["rms_ffn"] = norm(c.n_layers, c.dim)
    np_w["rms_final"] = norm(c.dim)
    np_w["q_norm"] = norm(c.n_layers, c.head_dim)
    np_w["k_norm"] = norm(c.n_layers, c.head_dim)
    for name, shape in [
        ("wq", (c.n_layers, c.all_heads_dim, c.dim)),
        ("wk", (c.n_layers, c.kv_dim, c.dim)),
        ("wv", (c.n_layers, c.kv_dim, c.dim)),
        ("wo", (c.n_layers, c.dim, c.all_heads_dim)),
        ("w1", (c.n_layers, c.hidden_dim, c.dim)),
        ("w2", (c.n_layers, c.dim, c.hidden_dim)),
        ("w3", (c.n_layers, c.hidden_dim, c.dim)),
    ]:
        np_w[f"{name}.q"], np_w[f"{name}.s"] = qw(*shape)
    np_w["lm_head.q"], np_w["lm_head.s"] = np_w["embed.q"], np_w["embed.s"]

    def qt(name):
        return QuantizedTensor(jnp.asarray(np_w[f"{name}.q"]), jnp.asarray(np_w[f"{name}.s"]))

    def qt_T(name):
        """In-major compute layout: codes [L, in, out], scales [L, in/g, out]."""
        return QuantizedTensor(
            jnp.asarray(np.swapaxes(np_w[f"{name}.q"], -1, -2).copy()),
            jnp.asarray(np.swapaxes(np_w[f"{name}.s"], -1, -2).copy()),
        )

    def fuse(*names):
        parts = [qt_T(n) for n in names]
        return QuantizedTensor(
            jnp.concatenate([p.q for p in parts], axis=-1),
            jnp.concatenate([p.scales for p in parts], axis=-1),
        )

    weights = Qwen3Weights(
        embed=qt("embed"),
        layers=Qwen3LayerWeights(
            rms_att=jnp.asarray(np_w["rms_att"]),
            rms_ffn=jnp.asarray(np_w["rms_ffn"]),
            q_norm=jnp.asarray(np_w["q_norm"]),
            k_norm=jnp.asarray(np_w["k_norm"]),
            wqkv=fuse("wq", "wk", "wv"),
            wo=qt_T("wo"),
            w13=fuse("w1", "w3"),
            w2=qt_T("w2"),
        ),
        rms_final=jnp.asarray(np_w["rms_final"]),
        lm_head=QuantizedTensor(
            jnp.asarray(np_w["lm_head.q"].T.copy()), jnp.asarray(np_w["lm_head.s"].T.copy())
        ),
    )
    return np_w, weights


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(7)
    config = TINY_CONFIG
    np_w, weights = make_weights(config, rng)
    return config, np_w, weights


def test_decode_parity_over_sequence(parity_setup):
    """Feed the same token sequence one position at a time; logits must track
    the reference within f32 reordering noise and greedy argmax must agree."""
    config, np_w, weights = parity_setup
    ref = RefQwen3(config, np_w)
    cache = init_kv_cache(config, 1)

    tokens = [3, 17, 42, 5, 88, 1, 64, 30]
    for pos, tok in enumerate(tokens):
        ref_logits = ref.forward(tok, pos)
        logits, cache = qwen3_forward(
            config,
            weights,
            jnp.asarray([[tok]], jnp.int32),
            cache,
            jnp.asarray([pos], jnp.int32),
            mode="exact",
        )
        got = np.asarray(logits)[0]
        np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)
        assert int(np.argmax(got)) == int(np.argmax(ref_logits))


def test_prefill_matches_decode(parity_setup):
    """One batched prefill call must equal the token-by-token decode path."""
    config, _, weights = parity_setup
    tokens = [3, 17, 42, 5, 88]

    cache_a = init_kv_cache(config, 1)
    logits_prefill, cache_a = qwen3_forward(
        config,
        weights,
        jnp.asarray([tokens], jnp.int32),
        cache_a,
        jnp.zeros(1, jnp.int32),
        mode="exact",
    )

    cache_b = init_kv_cache(config, 1)
    for pos, tok in enumerate(tokens):
        logits_decode, cache_b = qwen3_forward(
            config,
            weights,
            jnp.asarray([[tok]], jnp.int32),
            cache_b,
            jnp.asarray([pos], jnp.int32),
            mode="exact",
        )
    np.testing.assert_allclose(
        np.asarray(logits_prefill), np.asarray(logits_decode), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_a.k), np.asarray(cache_b.k), rtol=1e-5, atol=1e-5
    )


def test_fast_mode_tracks_exact(parity_setup):
    """W8A16 fast mode differs only by activation-quant noise."""
    config, _, weights = parity_setup
    tokens = [3, 17, 42, 5]
    for mode in ["exact", "fast"]:
        cache = init_kv_cache(config, 1)
        logits, cache = qwen3_forward(
            config,
            weights,
            jnp.asarray([tokens], jnp.int32),
            cache,
            jnp.zeros(1, jnp.int32),
            mode=mode,
        )
        if mode == "exact":
            exact = np.asarray(logits)
        else:
            fast = np.asarray(logits)
    # bf16 activations: tolerances scale with logit magnitude.
    np.testing.assert_allclose(fast, exact, rtol=0.1, atol=0.15)
    assert int(np.argmax(fast)) == int(np.argmax(exact))


def test_batched_requests_independent(parity_setup):
    """Two requests in one batch must match two single-request runs."""
    config, _, weights = parity_setup
    t1 = [3, 17, 42]
    t2 = [9, 2, 55]

    cache = init_kv_cache(config, 2)
    logits, _ = qwen3_forward(
        config,
        weights,
        jnp.asarray([t1, t2], jnp.int32),
        cache,
        jnp.zeros(2, jnp.int32),
        mode="exact",
    )
    for i, toks in enumerate([t1, t2]):
        cache_i = init_kv_cache(config, 1)
        solo, _ = qwen3_forward(
            config,
            weights,
            jnp.asarray([toks], jnp.int32),
            cache_i,
            jnp.zeros(1, jnp.int32),
            mode="exact",
        )
        np.testing.assert_allclose(
            np.asarray(logits)[i], np.asarray(solo)[0], rtol=1e-4, atol=1e-4
        )


def test_out_idx_selects_row(parity_setup):
    """Padded prefill with out_idx must match unpadded prefill."""
    config, _, weights = parity_setup
    tokens = [3, 17, 42, 5, 88]
    padded = tokens + [0, 0, 0]

    cache_a = init_kv_cache(config, 1)
    logits_a, _ = qwen3_forward(
        config,
        weights,
        jnp.asarray([tokens], jnp.int32),
        cache_a,
        jnp.zeros(1, jnp.int32),
        mode="exact",
    )
    cache_b = init_kv_cache(config, 1)
    logits_b, _ = qwen3_forward(
        config,
        weights,
        jnp.asarray([padded], jnp.int32),
        cache_b,
        jnp.zeros(1, jnp.int32),
        mode="exact",
        out_idx=jnp.asarray([len(tokens) - 1], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=1e-5, atol=1e-5
    )


def test_int4_forward_fast_tracks_f32(parity_setup):
    """Full model forward with INT4 linear layers (XLA fallback path on
    tiny shapes): fast mode must track the f32-dequant reference of the
    SAME int4 weights within bf16 tolerance."""
    config, _, weights = parity_setup
    from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
    from qwen3_rs_tpu.ops.quant import Q4Tensor, pack_q4_np, quantize_weights_q4_np

    rng = np.random.default_rng(7)
    g = config.group_size

    def q4_stack(in_dim, out_dim):
        w = rng.normal(0, 0.08, (config.n_layers, out_dim, in_dim)).astype(np.float32)
        q, s, _ = quantize_weights_q4_np(w, g)  # [L, out, in]
        qT = np.ascontiguousarray(np.swapaxes(q, 1, 2))  # [L, in, out]
        sT = np.ascontiguousarray(np.swapaxes(s, 1, 2))
        return Q4Tensor(jnp.asarray(pack_q4_np(qT, g)), jnp.asarray(sT))

    c = config
    layers = weights.layers._replace(
        wqkv=q4_stack(c.dim, c.all_heads_dim + 2 * c.kv_dim),
        wo=q4_stack(c.all_heads_dim, c.dim),
        w13=q4_stack(c.dim, 2 * c.hidden_dim),
        w2=q4_stack(c.hidden_dim, c.dim),
    )
    w4 = weights._replace(layers=layers)

    tokens = jnp.asarray([[3, 17, 42, 5]], jnp.int32)
    outs = {}
    for mode in ("fast", "f32"):
        cache = init_kv_cache(config, 1, dtype=jnp.float32)
        logits, _ = qwen3_forward(
            config, w4, tokens, cache, jnp.zeros(1, jnp.int32), mode=mode
        )
        outs[mode] = np.asarray(logits)
    np.testing.assert_allclose(outs["fast"], outs["f32"], rtol=0.1, atol=0.15)
    # And exact mode must refuse int4.
    import pytest

    cache = init_kv_cache(config, 1, dtype=jnp.float32)
    with pytest.raises(ValueError, match="INT4"):
        qwen3_forward(config, w4, tokens, cache, jnp.zeros(1, jnp.int32), mode="exact")


def test_fused_glue_path_matches_xla(rng, monkeypatch):
    """Fused-glue decode projections (RMSNorm/SwiGLU/residual in-kernel)
    produce the same forward as the XLA composition — branch wiring test;
    kernel numerics are covered in test_matmul.py."""
    import functools

    import qwen3_rs_tpu.ops.pallas as pallas_pkg
    from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
    from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_fused

    config = ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        dim=256,
        hidden_dim=256,
        n_layers=2,
        n_heads=2,
        n_kv_heads=1,
        head_dim=128,
        seq_len=64,
        vocab_size=96,
        group_size=64,
        shared_classifier=True,
    )
    _, weights = make_weights(config, rng)
    cache = init_kv_cache(config, batch=2, dtype=jnp.bfloat16)
    tokens = jnp.asarray([[7], [9]], jnp.int32)
    pos = jnp.asarray([3, 0], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast"
    )

    calls = {"n": 0}

    def fused_interp(x, w, idx, **kw):
        calls["n"] += 1
        return qmatmul_pallas_stacked_fused(x, w, idx, interpret=True, **kw)

    monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
    monkeypatch.setattr(pallas_pkg, "qmatmul_pallas_stacked_fused", fused_interp)
    out_logits, out_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast"
    )
    assert calls["n"] == 4  # wqkv, wo, w13, w2 all routed through the kernel
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=0.0, atol=0.25
    )
    np.testing.assert_allclose(
        np.asarray(out_cache.k, np.float32),
        np.asarray(ref_cache.k, np.float32),
        rtol=0.0,
        atol=0.05,
    )
