"""Paged flash decode kernel: interpret-mode parity vs the XLA paged path."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_rs_tpu.ops.attention import gqa_attention_split_paged
from qwen3_rs_tpu.ops.pallas.paged_attention import (
    paged_decode_supported,
    paged_gqa_decode_stacked,
)

PAGE = 128


def _make_pool(rng, L, P, n_kv, hd, dtype=np.float32):
    k = rng.normal(0, 1, (L, P, n_kv, PAGE, hd)).astype(dtype)
    v = rng.normal(0, 1, (L, P, n_kv, PAGE, hd)).astype(dtype)
    return k, v


def _page_table(rng, B, max_pages, n_pages):
    # Non-trivial page ids (shuffled, disjoint across slots; 0 = null page).
    ids = rng.permutation(np.arange(1, n_pages))[: B * max_pages]
    return ids.reshape(B, max_pages).astype(np.int32)


@pytest.mark.parametrize("pos_vals", [[300, 0], [PAGE, 2 * PAGE - 1], [1, 513]])
def test_matches_xla_paged(rng, pos_vals):
    L, B, n_kv, hd, kv_mul = 2, 2, 2, 128, 2
    n_heads = n_kv * kv_mul
    max_pages = 6
    P = 1 + B * max_pages
    k_pool, v_pool = _make_pool(rng, L, P, n_kv, hd)
    pt = _page_table(rng, B, max_pages, P)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array(pos_vals, np.int32)
    layer = 1

    out = np.asarray(
        paged_gqa_decode_stacked(
            jnp.asarray(q),
            jnp.asarray(kn),
            jnp.asarray(vn),
            jnp.asarray(k_pool),
            jnp.asarray(v_pool),
            jnp.asarray(pt),
            jnp.asarray(pos),
            layer,
            interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split_paged(
            jnp.asarray(q)[:, None],
            jnp.asarray(k_pool[layer]),
            jnp.asarray(v_pool[layer]),
            jnp.asarray(pt),
            jnp.asarray(kn)[:, None],
            jnp.asarray(vn)[:, None],
            jnp.asarray(pos),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_matches_xla_paged_int8(rng):
    L, B, n_kv, hd, kv_mul = 2, 2, 2, 128, 4
    n_heads = n_kv * kv_mul
    max_pages = 4
    P = 1 + B * max_pages
    k_codes = rng.integers(-127, 128, (L, P, n_kv, PAGE, hd)).astype(np.int8)
    v_codes = rng.integers(-127, 128, (L, P, n_kv, PAGE, hd)).astype(np.int8)
    k_sc = rng.uniform(0.005, 0.02, (L, P, n_kv, PAGE)).astype(np.float32)
    v_sc = rng.uniform(0.005, 0.02, (L, P, n_kv, PAGE)).astype(np.float32)
    pt = _page_table(rng, B, max_pages, P)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array([400, 129], np.int32)
    layer = 0

    out = np.asarray(
        paged_gqa_decode_stacked(
            jnp.asarray(q),
            jnp.asarray(kn),
            jnp.asarray(vn),
            jnp.asarray(k_codes),
            jnp.asarray(v_codes),
            jnp.asarray(pt),
            jnp.asarray(pos),
            layer,
            k_scale_pool=jnp.asarray(k_sc),
            v_scale_pool=jnp.asarray(v_sc),
            interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split_paged(
            jnp.asarray(q)[:, None],
            jnp.asarray(k_codes[layer]),
            jnp.asarray(v_codes[layer]),
            jnp.asarray(pt),
            jnp.asarray(kn)[:, None],
            jnp.asarray(vn)[:, None],
            jnp.asarray(pos),
            k_scale_pool=jnp.asarray(k_sc[layer]),
            v_scale_pool=jnp.asarray(v_sc[layer]),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_bf16_pool(rng):
    L, B, n_kv, hd, kv_mul = 1, 3, 2, 128, 2
    n_heads = n_kv * kv_mul
    max_pages = 3
    P = 1 + B * max_pages
    k_pool, v_pool = _make_pool(rng, L, P, n_kv, hd)
    k_pool = k_pool.astype(jnp.bfloat16)
    v_pool = v_pool.astype(jnp.bfloat16)
    pt = _page_table(rng, B, max_pages, P)
    q = rng.normal(0, 1, (B, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (B, n_kv, hd)).astype(np.float32)
    pos = np.array([200, 0, 384], np.int32)

    out = np.asarray(
        paged_gqa_decode_stacked(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(pt), jnp.asarray(pos), 0, interpret=True,
        )
    )
    ref = np.asarray(
        gqa_attention_split_paged(
            jnp.asarray(q)[:, None],
            jnp.asarray(k_pool[0]),
            jnp.asarray(v_pool[0]),
            jnp.asarray(pt),
            jnp.asarray(kn)[:, None],
            jnp.asarray(vn)[:, None],
            jnp.asarray(pos),
        )
    )[:, 0]
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_forward_branch_wiring(rng, monkeypatch):
    """qwen3_forward's use_paged_flash branch (gates patched on, kernel in
    interpret mode) must match the XLA paged path — logits and cache."""
    import functools

    import jax

    from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
    from qwen3_rs_tpu.models.qwen3 import qwen3_forward
    from qwen3_rs_tpu.serving.paged_cache import init_paged_cache
    from qwen3_rs_tpu.testing import random_weights
    import qwen3_rs_tpu.ops.pallas as pallas_pkg
    import qwen3_rs_tpu.ops.pallas.paged_attention as pa
    import qwen3_rs_tpu.ops.pallas.qmatmul as qmm

    config = ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        dim=64,
        hidden_dim=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=128,  # kernel gate: 128-lane
        seq_len=512,
        vocab_size=256,
        group_size=32,
        shared_classifier=True,
    ).validate()
    weights = random_weights(config)
    cache = init_paged_cache(config, n_pages=6, page_size=PAGE)
    cache = cache._replace(
        k=jnp.asarray(rng.normal(0, 1, cache.k.shape), cache.k.dtype),
        v=jnp.asarray(rng.normal(0, 1, cache.v.shape), cache.v.dtype),
    )
    tables = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    pos = jnp.asarray([200, 37], jnp.int32)
    tokens = jnp.asarray([[7], [9]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast", page_table=tables
    )

    monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
    monkeypatch.setattr(qmm, "supports_shapes", lambda *a, **k: False)
    monkeypatch.setattr(qmm, "rows_supported", lambda *a, **k: False)
    monkeypatch.setattr(
        pa,
        "paged_gqa_decode_stacked",
        functools.partial(paged_gqa_decode_stacked, interpret=True),
    )
    out_logits, out_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast", page_table=tables
    )

    # Numerics are covered by the kernel-level parity tests (1e-4); this
    # test checks the branch wiring, and the two paths order bf16→f32
    # upcasts differently, which two layers + lm_head amplify.
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=0.0, atol=0.25
    )
    np.testing.assert_allclose(
        np.asarray(out_cache.k, np.float32),
        np.asarray(ref_cache.k, np.float32),
        rtol=0.0,
        atol=0.05,
    )



def test_supported_gates():
    assert paged_decode_supported(128, 128, jnp.bfloat16)
    assert paged_decode_supported(128, 256, jnp.int8)
    assert not paged_decode_supported(64, 128, jnp.bfloat16)  # head_dim lanes
    assert not paged_decode_supported(128, 64, jnp.bfloat16)  # page rows
    assert not paged_decode_supported(128, 128, jnp.float16)  # dtype


class TestPagedWindowKernel:
    """Small-window partials kernel vs the XLA paged path (S > 1)."""

    def _case(self, rng, pos_vals, s, kv_mul=2, int8=False, L=2, n_kv=2, hd=128):
        n_heads = n_kv * kv_mul
        B = len(pos_vals)
        max_pages = 6
        P = 1 + B * max_pages
        if int8:
            k_pool = rng.integers(-127, 128, (L, P, n_kv, PAGE, hd)).astype(np.int8)
            v_pool = rng.integers(-127, 128, (L, P, n_kv, PAGE, hd)).astype(np.int8)
            scales = dict(
                k_scale_pool=jnp.asarray(
                    rng.uniform(0.005, 0.02, (L, P, n_kv, PAGE)).astype(np.float32)
                ),
                v_scale_pool=jnp.asarray(
                    rng.uniform(0.005, 0.02, (L, P, n_kv, PAGE)).astype(np.float32)
                ),
            )
        else:
            k_pool, v_pool = _make_pool(rng, L, P, n_kv, hd)
            scales = {}
        pt = _page_table(rng, B, max_pages, P)
        q = rng.normal(0, 1, (B, s, n_heads, hd)).astype(np.float32)
        kn = rng.normal(0, 1, (B, s, n_kv, hd)).astype(np.float32)
        vn = rng.normal(0, 1, (B, s, n_kv, hd)).astype(np.float32)
        pos = np.array(pos_vals, np.int32)
        layer = L - 1

        from qwen3_rs_tpu.ops.pallas.paged_attention import paged_gqa_window_stacked

        out = np.asarray(
            paged_gqa_window_stacked(
                jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
                jnp.asarray(k_pool), jnp.asarray(v_pool),
                jnp.asarray(pt), jnp.asarray(pos), layer,
                interpret=True, **scales,
            )
        )
        ref_scales = {k: v[layer] for k, v in scales.items()}
        ref = np.asarray(
            gqa_attention_split_paged(
                jnp.asarray(q),
                jnp.asarray(k_pool[layer]),
                jnp.asarray(v_pool[layer]),
                jnp.asarray(pt),
                jnp.asarray(kn),
                jnp.asarray(vn),
                jnp.asarray(pos),
                **ref_scales,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pos_vals,s", [([300, 0], 4), ([PAGE, 513], 7)])
    def test_matches_xla(self, rng, pos_vals, s):
        self._case(rng, pos_vals, s)

    def test_matches_xla_int8(self, rng):
        self._case(rng, [400, 129], s=5, kv_mul=4, int8=True)

    def test_supported_gates(self):
        from qwen3_rs_tpu.ops.pallas.paged_attention import paged_window_supported

        assert paged_window_supported(128, 128, jnp.bfloat16, s=4, kv_mul=4)
        assert not paged_window_supported(128, 128, jnp.bfloat16, s=1, kv_mul=4)
        assert not paged_window_supported(128, 128, jnp.bfloat16, s=64, kv_mul=4)
        assert not paged_window_supported(64, 128, jnp.bfloat16, s=4, kv_mul=4)


def test_forward_window_branch_wiring(rng, monkeypatch):
    """qwen3_forward's use_paged_flash_window branch (S>1, gates patched on,
    kernel in interpret mode) must match the XLA paged path."""
    import functools

    from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
    from qwen3_rs_tpu.models.qwen3 import qwen3_forward
    from qwen3_rs_tpu.serving.paged_cache import init_paged_cache
    from qwen3_rs_tpu.testing import random_weights
    import qwen3_rs_tpu.ops.pallas as pallas_pkg
    import qwen3_rs_tpu.ops.pallas.paged_attention as pa
    import qwen3_rs_tpu.ops.pallas.qmatmul as qmm

    config = ModelConfig(
        architecture_id=ARCHITECTURE_QWEN3,
        dim=64,
        hidden_dim=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=128,
        seq_len=512,
        vocab_size=256,
        group_size=32,
        shared_classifier=True,
    ).validate()
    weights = random_weights(config)
    cache = init_paged_cache(config, n_pages=6, page_size=PAGE)
    cache = cache._replace(
        k=jnp.asarray(rng.normal(0, 1, cache.k.shape), cache.k.dtype),
        v=jnp.asarray(rng.normal(0, 1, cache.v.shape), cache.v.dtype),
    )
    tables = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    pos = jnp.asarray([200, 37], jnp.int32)
    tokens = jnp.asarray([[7, 3, 11], [9, 2, 5]], jnp.int32)  # S=3 verify-shaped

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast", page_table=tables,
        return_all_logits=True,
    )

    monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
    monkeypatch.setattr(qmm, "supports_shapes", lambda *a, **k: False)
    monkeypatch.setattr(qmm, "rows_supported", lambda *a, **k: False)
    monkeypatch.setattr(
        pa,
        "paged_gqa_window_stacked",
        functools.partial(pa.paged_gqa_window_stacked, interpret=True),
    )

    def boom(*a, **k):
        raise AssertionError("S>1 must not hit the decode kernel")

    monkeypatch.setattr(pa, "paged_gqa_decode_stacked", boom)
    out_logits, out_cache = qwen3_forward(
        config, weights, tokens, cache, pos, mode="fast", page_table=tables,
        return_all_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=0.0, atol=0.5
    )
    np.testing.assert_allclose(
        np.asarray(out_cache.k, np.float32),
        np.asarray(ref_cache.k, np.float32),
        rtol=0.0,
        atol=0.05,
    )
