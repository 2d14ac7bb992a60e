"""RMSNorm / RoPE / attention / softmax parity vs the numpy reference."""

import numpy as np
import jax.numpy as jnp

import ref_engine
from qwen3_rs_tpu.ops.attention import gqa_attention_xla
from qwen3_rs_tpu.ops.norms import rms_norm
from qwen3_rs_tpu.ops.rope import apply_rope, rope_table


def test_rms_norm_matches_reference(rng):
    x = rng.normal(0, 1, 64).astype(np.float32)
    w = rng.normal(1, 0.1, 64).astype(np.float32)
    expected = ref_engine.rms_norm(x, w)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_rms_norm_eps_inside_mean():
    # ε must be added to mean(x²), not to the sum (layers.rs:114).
    x = np.full(4, 1e-4, np.float32)
    w = np.ones(4, np.float32)
    expected = ref_engine.rms_norm(x, w)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_rope_matches_reference(rng):
    head_dim = 32
    for pos in [0, 1, 7, 100]:
        v = rng.normal(0, 1, head_dim).astype(np.float32)
        expected = ref_engine.rope_apply(v, pos)
        cos, sin = rope_table(128, head_dim, 1e6)
        out = np.asarray(apply_rope(jnp.asarray(v)[None, :], cos[pos], sin[pos]))[0]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_rope_preserves_norm(rng):
    v = rng.normal(0, 1, (2, 3, 4, 64)).astype(np.float32)
    cos, sin = rope_table(16, 64)
    out = np.asarray(apply_rope(jnp.asarray(v), cos[5], sin[5]))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-5
    )


def test_attention_matches_reference_loop(rng):
    b, t, n_heads, n_kv, hd = 1, 8, 4, 2, 16
    kv_mul = n_heads // n_kv
    q = rng.normal(0, 1, (b, 1, n_heads, hd)).astype(np.float32)
    k = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    pos = 5  # only t <= 5 participates

    out = np.asarray(
        gqa_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.full((b, 1), pos, jnp.int32)
        )
    )

    scale = 1.0 / np.sqrt(hd)
    for h in range(n_heads):
        kvh = h // kv_mul
        scores = (k[0, kvh, : pos + 1] @ q[0, 0, h]) * scale
        att = ref_engine.softmax(scores)
        expected = att @ v[0, kvh, : pos + 1]
        np.testing.assert_allclose(out[0, 0, h], expected, rtol=1e-5, atol=1e-5)


def test_attention_causal_mask(rng):
    """Changing future cache entries must not change outputs."""
    b, t, n_heads, n_kv, hd = 2, 16, 4, 4, 8
    q = rng.normal(0, 1, (b, 1, n_heads, hd)).astype(np.float32)
    k = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    pos = np.array([[3], [7]], np.int32)
    out1 = np.asarray(gqa_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos)))
    k2, v2 = k.copy(), v.copy()
    k2[0, :, 4:] = 99.0
    v2[0, :, 4:] = -99.0
    k2[1, :, 8:] = 99.0
    v2[1, :, 8:] = -99.0
    out2 = np.asarray(gqa_attention_xla(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(pos)))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_attention_split_equals_dense(rng):
    """Split (cache prefix + window) attention must equal attention over the
    fully-updated cache."""
    from qwen3_rs_tpu.ops.attention import gqa_attention_split

    b, t, n_heads, n_kv, hd, s = 2, 16, 4, 2, 8, 3
    k_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    k_new = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    v_new = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    pos_start = np.array([4, 0], np.int32)  # second request: empty cache
    q_pos = pos_start[:, None] + np.arange(s, dtype=np.int32)[None, :]

    out_split = np.asarray(
        gqa_attention_split(
            jnp.asarray(q),
            jnp.asarray(k_cache),
            jnp.asarray(v_cache),
            jnp.asarray(k_new),
            jnp.asarray(v_new),
            jnp.asarray(q_pos),
            jnp.asarray(pos_start),
        )
    )

    # Dense baseline: write the window into the cache, then mask by q_pos.
    k_full = k_cache.copy()
    v_full = v_cache.copy()
    for i in range(b):
        k_full[i, :, pos_start[i] : pos_start[i] + s] = np.swapaxes(k_new[i], 0, 1)
        v_full[i, :, pos_start[i] : pos_start[i] + s] = np.swapaxes(v_new[i], 0, 1)
    out_dense = np.asarray(
        gqa_attention_xla(
            jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full), jnp.asarray(q_pos)
        )
    )
    np.testing.assert_allclose(out_split, out_dense, rtol=1e-5, atol=1e-5)


def test_attention_query_chunking(rng, monkeypatch):
    """Chunked long-window attention must equal the unchunked computation."""
    import qwen3_rs_tpu.ops.attention as A

    b, t, n_kv, hd, s = 2, 64, 2, 8, 32
    n_heads = 4
    k_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    ps = np.array([16, 0], np.int32)
    qp = ps[:, None] + np.arange(s, dtype=np.int32)[None, :]
    args = tuple(map(jnp.asarray, (q, k_cache, v_cache, kn, vn, qp, ps)))

    full = np.asarray(A._split_attn_body(*args, win_offset=0))
    monkeypatch.setattr(A, "_QUERY_CHUNK", 8)
    chunked = np.asarray(A.gqa_attention_split(*args))
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_attention_prefill_window(rng):
    """Multi-row query window attends causally within the window."""
    b, t, n_heads, n_kv, hd, s = 1, 8, 2, 1, 8, 4
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    k = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    q_pos = np.arange(s, dtype=np.int32)[None, :]
    out = np.asarray(gqa_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(q_pos)))
    # Row i must equal a decode call at pos=i.
    for i in range(s):
        row = np.asarray(
            gqa_attention_xla(
                jnp.asarray(q[:, i : i + 1]),
                jnp.asarray(k),
                jnp.asarray(v),
                jnp.full((b, 1), i, jnp.int32),
            )
        )
        np.testing.assert_allclose(out[:, i : i + 1], row, rtol=1e-5, atol=1e-6)


def test_attention_online_cache_equals_dense(rng):
    """The position-bounded online-softmax cache path (engaged when the
    allocated window is large) must match the dense masked computation."""
    import qwen3_rs_tpu.ops.attention as A

    assert A._pick_cache_chunk(1024) == 512

    b, t, n_heads, n_kv, hd, s = 2, 1024, 4, 2, 8, 1
    k_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)

    for ps_vals in ([700, 3], [0, 0], [1024 - s, 512]):
        ps = np.asarray(ps_vals, np.int32)
        qp = ps[:, None] + np.arange(s, dtype=np.int32)[None, :]
        args = tuple(map(jnp.asarray, (q, k_cache, v_cache, kn, vn, qp, ps)))
        online = np.asarray(A.gqa_attention_split(*args))

        # Dense baseline over the fully-updated cache.
        k_full, v_full = k_cache.copy(), v_cache.copy()
        for i in range(b):
            k_full[i, :, ps[i] : ps[i] + s] = np.swapaxes(kn[i], 0, 1)
            v_full[i, :, ps[i] : ps[i] + s] = np.swapaxes(vn[i], 0, 1)
        dense = np.asarray(
            gqa_attention_xla(
                jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full), jnp.asarray(qp)
            )
        )
        np.testing.assert_allclose(online, dense, rtol=1e-5, atol=1e-5)


def test_attention_online_cache_prefill_rows(rng):
    """Online cache path with a multi-row window (prefill continuation)."""
    import qwen3_rs_tpu.ops.attention as A

    b, t, n_heads, n_kv, hd, s = 1, 512, 2, 1, 8, 16
    assert A._pick_cache_chunk(t) == 256
    k_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    v_cache = rng.normal(0, 1, (b, n_kv, t, hd)).astype(np.float32)
    q = rng.normal(0, 1, (b, s, n_heads, hd)).astype(np.float32)
    kn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    vn = rng.normal(0, 1, (b, s, n_kv, hd)).astype(np.float32)
    ps = np.asarray([300], np.int32)
    qp = ps[:, None] + np.arange(s, dtype=np.int32)[None, :]
    args = tuple(map(jnp.asarray, (q, k_cache, v_cache, kn, vn, qp, ps)))
    online = np.asarray(A.gqa_attention_split(*args))

    k_full, v_full = k_cache.copy(), v_cache.copy()
    k_full[0, :, 300 : 300 + s] = np.swapaxes(kn[0], 0, 1)
    v_full[0, :, 300 : 300 + s] = np.swapaxes(vn[0], 0, 1)
    dense = np.asarray(
        gqa_attention_xla(
            jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full), jnp.asarray(qp)
        )
    )
    np.testing.assert_allclose(online, dense, rtol=1e-5, atol=1e-5)


def test_cast_weight_scales_bf16():
    """bf16-scale weights must stay loadable through the fast forward and
    keep logits close to the f32-scale ones."""
    from qwen3_rs_tpu.models.qwen3 import cast_weight_scales, init_kv_cache, qwen3_forward
    from qwen3_rs_tpu.testing import qwen3_config, random_weights

    config = qwen3_config("0.6b", seq_len=32, n_layers=2)
    w = random_weights(config)
    wc = cast_weight_scales(w)
    assert wc.layers.w13.scales.dtype == jnp.bfloat16
    assert wc.lm_head.scales.dtype == jnp.bfloat16
    assert wc.embed.scales.dtype == jnp.float32

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    la, _ = qwen3_forward(config, w, tokens, init_kv_cache(config, 1), pos, mode="fast")
    lb, _ = qwen3_forward(config, wc, tokens, init_kv_cache(config, 1), pos, mode="fast")
    a, bvals = np.asarray(la), np.asarray(lb)
    # Random weights amplify the ~0.2% scale-rounding error through
    # cancellation; bound the deviation relative to the logit scale.
    assert np.max(np.abs(a - bvals)) / np.max(np.abs(a)) < 0.05
