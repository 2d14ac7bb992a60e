"""Parity tests for the whole-stack decode megakernel (interpret mode).

The megakernel runs the full layer loop inside one pallas_call; these
tests compare one decode step against the XLA fallback path of
``qwen3_forward`` on a cache warmed by a short prefill.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
from qwen3_rs_tpu.models.qwen3 import (
    cast_weight_scales,
    init_kv_cache,
    qwen3_forward,
)
from qwen3_rs_tpu.ops.matmul import qmatmul
from qwen3_rs_tpu.ops.norms import rms_norm
from qwen3_rs_tpu.ops.pallas.megakernel import (
    _mk_tiles,
    decode_stack_megakernel,
    megakernel_supported,
)
from qwen3_rs_tpu.ops.rope import rope_table
from qwen3_rs_tpu.testing import random_weights

CFG = ModelConfig(
    architecture_id=ARCHITECTURE_QWEN3,
    dim=256,
    hidden_dim=384,
    n_layers=3,
    n_heads=2,
    n_kv_heads=1,
    head_dim=128,
    vocab_size=512,
    seq_len=256,
    group_size=64,
    shared_classifier=True,
).validate()


def _mega_step(config, weights, token, cache, pos, write_mask=None):
    """One decode step through the megakernel (interpret) + shared head."""
    emb_q = weights.embed.q[token]  # [B, 1, dim]
    emb_s = weights.embed.scales[token]
    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    x = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    cos = cos_t[pos]  # [B, hd/2]
    sin = sin_t[pos]
    lw = weights.layers
    x_out, cache_out, _ = decode_stack_megakernel(
        config,
        x,
        lw.rms_att,
        lw.rms_ffn,
        lw.q_norm,
        lw.k_norm,
        cos,
        sin,
        lw.wqkv,
        lw.wo,
        lw.w13,
        lw.w2,
        cache.k,
        cache.v,
        pos,
        write_ok=write_mask,
        k_scale=getattr(cache, "k_scale", None),
        v_scale=getattr(cache, "v_scale", None),
        eps=config.norm_eps,
        interpret=True,
    )
    new_k, new_v = cache_out[0], cache_out[1]
    xn = rms_norm(x_out[:, None, :], weights.rms_final, config.norm_eps)
    logits = qmatmul(xn, weights.lm_head)[..., : config.vocab_size][:, 0]
    # The kernel wrote the step's rows into the cache in place.
    p = int(pos[0])
    return logits, new_k[:, 0, :, p, :], new_v[:, 0, :, p, :]


def _mega_ref_step(config, weights, token, cache, pos):
    """Pure-XLA emulation of the megakernel's exact numerics (bf16 scale_w
    dequant, bf16 dot inputs, f32 accumulation and residual stream).  The
    megakernel must match this TIGHTLY; its divergence from the production
    XLA fallback (f32 activations, post-dot scales) is expected bf16-level
    drift, checked loosely in the parity test."""
    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    lw = weights.layers
    eps = config.norm_eps
    hd = config.head_dim
    ah, kvd = config.all_heads_dim, config.kv_dim
    p = int(pos[0])

    emb_q = weights.embed.q[token]
    emb_s = weights.embed.scales[token]
    x = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[0, 0]  # [dim]
    cos_t, sin_t = rope_table(cache.seq_len, hd, config.rope_theta)
    cos, sin = cos_t[p], sin_t[p]  # [hd/2]

    def mm(xv, w, l):
        # Models the kernel's dequant+dot as interpret mode executes it:
        # CPU XLA runs with --xla_allow_excess_precision, so the bf16
        # ``codes * scale`` product fuses into the dot at f32 (no wf
        # rounding).  On real TPUs Mosaic rounds wf to bf16 like the
        # per-matrix kernels do — the production-path parity test bounds
        # that drift separately.
        codes, scales = w.q[l], w.scales[l]
        g = config.group_size
        tg = codes.shape[0] // g
        sc = jnp.broadcast_to(
            scales.astype(jnp.bfloat16).astype(jnp.float32)[:, None, :],
            (tg, g, codes.shape[1]),
        ).reshape(codes.shape)
        wf = codes.astype(jnp.float32) * sc
        return jnp.dot(
            xv.astype(jnp.bfloat16).astype(jnp.float32),
            wf,
            preferred_element_type=jnp.float32,
        )

    def rms(v, w):
        inv = jax.lax.rsqrt(jnp.mean(v * v, axis=-1, keepdims=True) + eps)
        return v * inv * w

    def rope(m):
        m1, m2 = m[:, : hd // 2], m[:, hd // 2 :]
        return jnp.concatenate([m1 * cos - m2 * sin, m1 * sin + m2 * cos], axis=1)

    ks, vs = [], []
    for l in range(config.n_layers):
        xn = rms(x, lw.rms_att[l])
        qkv = mm(xn, lw.wqkv, l)
        q = qkv[:ah].reshape(config.n_heads, hd)
        k = qkv[ah : ah + kvd].reshape(config.n_kv_heads, hd)
        v = qkv[ah + kvd :].reshape(config.n_kv_heads, hd)
        if config.use_qk_norm:
            q = rms(q, lw.q_norm[l])
            k = rms(k, lw.k_norm[l])
        q, k = rope(q), rope(k)
        ks.append(k)
        vs.append(v)
        # full-softmax attention over cache[:p] + self, f32
        kv_mul = config.n_heads // config.n_kv_heads
        kc = jnp.asarray(cache.k[l, 0, :, :p, :], jnp.float32)  # [kv, p, hd]
        vc = jnp.asarray(cache.v[l, 0, :, :p, :], jnp.float32)
        kfull = jnp.concatenate([kc, k[:, None, :]], axis=1)  # [kv, p+1, hd]
        vfull = jnp.concatenate([vc, v[:, None, :]], axis=1)
        qh = q.reshape(config.n_kv_heads, kv_mul, hd) / (hd**0.5)
        scores = jnp.einsum("kmh,kth->kmt", qh, kfull)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("kmt,kth->kmh", probs, vfull).reshape(ah)
        x = x + mm(att, lw.wo, l)
        xn2 = rms(x, lw.rms_ffn[l])
        gu = mm(xn2, lw.w13, l)
        gate, up = gu[: config.hidden_dim], gu[config.hidden_dim :]
        h = gate * jax.nn.sigmoid(gate) * up
        x = x + mm(h, lw.w2, l)
    return x, jnp.stack(ks), jnp.stack(vs)


def test_megakernel_matches_exact_emulation():
    """Tight check: the kernel must reproduce the numerics-matched XLA
    emulation to float-accumulation-order level."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 13)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([13], jnp.int32)
    tok = jnp.asarray([[42]], jnp.int32)

    _, k_rows, v_rows = _mega_step(config, weights, tok, cache, pos)
    # recompute x_out via the kernel for the direct residual comparison
    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    emb_q = weights.embed.q[tok]
    emb_s = weights.embed.scales[tok]
    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    x_out, _, _ = decode_stack_megakernel(
        config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
        cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
        cache.k, cache.v, pos, eps=config.norm_eps, interpret=True,
    )
    ref_x, ref_k, ref_v = _mega_ref_step(config, weights, tok, cache, pos)

    np.testing.assert_allclose(
        np.asarray(k_rows), np.asarray(ref_k), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_rows), np.asarray(ref_v), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(x_out[0]), np.asarray(ref_x), rtol=5e-3, atol=5e-3
    )


def test_megakernel_fused_head_parity():
    """The in-kernel classifier phase must match the external head path."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 19)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([19], jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    manual_logits, _, _ = _mega_step(config, weights, tok, cache, pos)

    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    emb_q = weights.embed.q[tok]
    emb_s = weights.embed.scales[tok]
    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    _, _, logits_pad = decode_stack_megakernel(
        config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
        cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
        cache.k, cache.v, pos, weights.rms_final, weights.lm_head,
        eps=config.norm_eps, interpret=True,
    )
    assert logits_pad is not None
    fused = np.asarray(logits_pad[:, : config.vocab_size], np.float32)
    manual = np.asarray(manual_logits, np.float32)
    # The manual head runs the XLA fallback qmatmul (f32 activations) —
    # drift-bounded comparison, same rationale as the production parity.
    assert np.abs(fused - manual).max() / max(1.0, np.abs(manual).max()) < 0.03
    assert int(fused.argmax()) == int(manual.argmax())


def test_megakernel_head_a8_parity():
    """The A8 classifier phase (per-group int8 dots + f32 fixup) stays
    within the activation-quantization noise bound of the exact head."""
    from qwen3_rs_tpu.ops.pallas.megakernel import megakernel_tuning

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 19)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([19], jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    emb_q = weights.embed.q[tok]
    emb_s = weights.embed.scales[tok]
    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    outs = {}
    for a8 in (0, 1):
        tuning = (*megakernel_tuning()[:6], a8)
        _, _, logits_pad = decode_stack_megakernel(
            config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
            cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
            jnp.copy(cache.k), jnp.copy(cache.v), pos,
            weights.rms_final, weights.lm_head,
            eps=config.norm_eps, interpret=True, tuning=tuning,
        )
        outs[a8] = np.asarray(logits_pad[:, : config.vocab_size], np.float32)
    # int8 activation quantization (per-128-lane symmetric) perturbs the
    # logits by ~|x|/254 per element accumulated over dim — well under the
    # bf16-path parity tolerance at these dims.
    rel = np.abs(outs[1] - outs[0]).max() / max(1.0, np.abs(outs[0]).max())
    assert rel < 0.05, rel


def test_megakernel_head_pipe_parity():
    """The software-pipelined classifier phase (dequant tile t while the
    MXU dots tile t-1) computes the same dequant+dot math; only the float
    association may shift (the pipe's scratch store is a fusion barrier —
    measured: the piped arm matches the eager bf16 dequant→dot reference
    bit-for-bit, the unpiped arm carries compiler-fusion drift), so the
    comparison is drift-bounded like test_megakernel_fused_head_parity."""
    from qwen3_rs_tpu.ops.pallas.megakernel import megakernel_tuning

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 19)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([19], jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    emb_q = weights.embed.q[tok]
    emb_s = weights.embed.scales[tok]
    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    outs = {}
    toks = {}
    for pipe in (0, 1):
        tuning = (*megakernel_tuning()[:8], pipe)
        _, _, logits_pad = decode_stack_megakernel(
            config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
            cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
            jnp.copy(cache.k), jnp.copy(cache.v), pos,
            weights.rms_final, weights.lm_head,
            eps=config.norm_eps, interpret=True, tuning=tuning,
        )
        outs[pipe] = np.asarray(logits_pad[:, : config.vocab_size], np.float32)
        # Greedy (fused argmax) epilogue under the pipe as well.
        _, _, tok_out = decode_stack_megakernel(
            config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
            cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
            jnp.copy(cache.k), jnp.copy(cache.v), pos,
            weights.rms_final, weights.lm_head,
            eps=config.norm_eps, interpret=True, tuning=tuning, greedy=True,
        )
        toks[pipe] = int(np.asarray(tok_out)[0])
    rel = np.abs(outs[1] - outs[0]).max() / max(1.0, np.abs(outs[0]).max())
    assert rel < 0.03, rel
    # The fused greedy token must match each arm's own logits argmax.
    for pipe in (0, 1):
        assert toks[pipe] == int(outs[pipe].argmax())


def test_tiles_exist_for_real_models():
    # 8B / 0.6B body dims must all be tileable.
    for dims in [
        (4096, 6144), (4096, 4096), (4096, 24576), (12288, 4096),  # 8B
        (1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024),  # 0.6B
    ]:
        assert _mk_tiles(*dims, 64) is not None, dims


def test_full_depth_tiles():
    tb = 2 * 1024 * 1024
    # Full-depth candidacy fixes the dim-2560 (4B) plans: w13's factor-19
    # column count forces 512 KB tiles under the 1024-row cap; tn == n
    # restores >1.3 MB K=1 tiles.
    assert _mk_tiles(2560, 19456, 64, tile_bytes=tb) == (512, 1024)
    assert _mk_tiles(2560, 19456, 64, tile_bytes=tb, full_depth=True) == (2560, 512)
    assert _mk_tiles(2560, 6144, 64, tile_bytes=tb, full_depth=True) == (2560, 768)
    # 8B plans must NOT change under full-depth candidacy (ties keep the
    # legacy pick — the tuned flagship config is preserved bit-for-bit).
    for dims in [(4096, 6144), (4096, 4096), (4096, 24576), (12288, 4096)]:
        assert _mk_tiles(*dims, 64, tile_bytes=tb) == _mk_tiles(
            *dims, 64, tile_bytes=tb, full_depth=True
        ), dims
    # Full-depth plans keep the 8-aligned scale-row extent the kernel's
    # HBM slices need.
    for n, d in [(2560, 19456), (2560, 6144), (2560, 153600)]:
        tn, _ = _mk_tiles(n, d, 64, tile_bytes=6 * tb, td_cap=8192, full_depth=True)
        assert (tn // 64) % 8 == 0


def test_supported_gates():
    from qwen3_rs_tpu.testing import qwen3_config

    for name in ("0.6b", "4b", "8b"):
        big = qwen3_config(name, seq_len=1024)
        assert megakernel_supported(big, 1024, jnp.dtype(jnp.bfloat16)), name
        assert megakernel_supported(big, 1024, jnp.dtype(jnp.float32)), name
    big = qwen3_config("8b", seq_len=1024)
    assert not megakernel_supported(big, 100, jnp.dtype(jnp.bfloat16))  # T % blk
    # INT8 cache variant (batched too), up to the batch cap.
    assert megakernel_supported(big, 1024, jnp.dtype(jnp.int8))
    assert megakernel_supported(big, 1024, jnp.dtype(jnp.bfloat16), batch=8)
    assert not megakernel_supported(big, 1024, jnp.dtype(jnp.bfloat16), batch=32)
    bad = dataclasses.replace(big, head_dim=64, dim=2048)
    assert not megakernel_supported(bad, 1024, jnp.dtype(jnp.bfloat16))
    # Tiny test dims: group rows per tile < 8 → interpret-mode only.
    assert not megakernel_supported(CFG, 256, jnp.dtype(jnp.bfloat16))


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
def test_megakernel_decode_parity(cache_dtype):
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 17)), jnp.int32)

    cache = init_kv_cache(config, batch=1, dtype=cache_dtype)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([17], jnp.int32)
    tok = jnp.asarray([[42]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tok, cache, pos, mode="fast"
    )
    got_logits, k_rows, v_rows = _mega_step(config, weights, tok, cache, pos)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    # The production XLA fallback keeps f32 activations and applies scales
    # after the dot — systematically more precise than the bf16 scale_w
    # numerics both the Pallas kernels and the megakernel use, so this is
    # a drift-bounded sanity check (the tight parity bar is the matched
    # emulation in test_megakernel_matches_exact_emulation).
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 0.03
    assert int(np.argmax(got)) == int(np.argmax(ref))

    # New K/V rows must match the rows the reference step wrote at `pos`
    # (same drift-bounded comparison as the logits).
    for got_rows, ref_rows in (
        (k_rows, ref_cache.k[:, 0, :, 17, :]),
        (v_rows, ref_cache.v[:, 0, :, 17, :]),
    ):
        r = np.asarray(ref_rows, np.float32)
        d = np.abs(np.asarray(got_rows, np.float32) - r)
        assert d.max() / max(1.0, np.abs(r).max()) < 0.03


def test_megakernel_batched_parity():
    """Batched decode (per-row positions + write mask) matches the XLA
    batched forward: logits per row, rows written at each pos, masked rows
    untouched."""
    from qwen3_rs_tpu.models.qwen3 import KVCache

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(7)
    B = 3
    shape = (config.n_layers, B, config.n_kv_heads, config.seq_len, config.head_dim)
    cache = KVCache(
        jnp.asarray(rng.normal(0, 1, shape), jnp.float32),
        jnp.asarray(rng.normal(0, 1, shape), jnp.float32),
    )
    pos = jnp.asarray([17, 3, 40], jnp.int32)
    mask = jnp.asarray([True, True, False])
    toks = jnp.asarray([[42], [7], [9]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, toks, cache, pos, mode="fast", write_mask=mask
    )
    got_logits, _, _ = _mega_step(config, weights, toks, cache, pos, write_mask=mask)

    # Re-run the raw kernel to inspect the cache (the _mega_step helper
    # only returns row-b=0 slices).
    emb_q = weights.embed.q[toks]
    emb_s = weights.embed.scales[toks]
    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    _, cache_out, _ = decode_stack_megakernel(
        config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
        cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
        cache.k, cache.v, pos, write_ok=mask,
        eps=config.norm_eps, interpret=True,
    )
    new_k, new_v = cache_out

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 0.03
    for b in range(B):
        assert int(np.argmax(got[b])) == int(np.argmax(ref[b])), b

    # Written rows match the XLA scatter's rows; masked row untouched.
    for b, p in ((0, 17), (1, 3)):
        for pool, ref_pool in ((new_k, ref_cache.k), (new_v, ref_cache.v)):
            r = np.asarray(ref_pool[:, b, :, p, :], np.float32)
            d = np.abs(np.asarray(pool[:, b, :, p, :], np.float32) - r)
            assert d.max() / max(1.0, np.abs(r).max()) < 0.03, b
    np.testing.assert_array_equal(
        np.asarray(new_k[:, 2]), np.asarray(cache.k[:, 2])
    )


def test_megakernel_int8_cache_parity():
    """INT8 dense cache: in-kernel dequant attention + in-kernel row
    quantization match the XLA INT8 path."""
    from qwen3_rs_tpu.models.qwen3 import QuantizedKVCache

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=4))
    rng = np.random.default_rng(9)
    B = 2
    shape = (config.n_layers, B, config.n_kv_heads, config.seq_len, config.head_dim)
    cache = QuantizedKVCache(
        jnp.asarray(rng.integers(-127, 128, shape), jnp.int8),
        jnp.asarray(rng.integers(-127, 128, shape), jnp.int8),
        jnp.asarray(rng.uniform(0.005, 0.02, shape[:-1]), jnp.float32),
        jnp.asarray(rng.uniform(0.005, 0.02, shape[:-1]), jnp.float32),
    )
    pos = jnp.asarray([130, 5], jnp.int32)
    toks = jnp.asarray([[42], [7]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, toks, cache, pos, mode="fast"
    )

    emb_q = weights.embed.q[toks]
    emb_s = weights.embed.scales[toks]
    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers
    x_out, cache_out, _ = decode_stack_megakernel(
        config, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
        cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
        cache.k, cache.v, pos,
        k_scale=cache.k_scale, v_scale=cache.v_scale,
        eps=config.norm_eps, interpret=True,
    )
    new_k, new_v, new_ks, new_vs = cache_out
    xn = rms_norm(x_out[:, None, :], weights.rms_final, config.norm_eps)
    got_logits = qmatmul(xn, weights.lm_head)[..., : config.vocab_size][:, 0]

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 0.03
    for b in range(B):
        assert int(np.argmax(got[b])) == int(np.argmax(ref[b])), b

    # In-kernel row quantization matches the XLA quant_rows scatter:
    # codes within ±1 (independent rounding of near-identical values),
    # scales tight.
    for b, p in ((0, 130), (1, 5)):
        for pool, ref_pool in ((new_k, ref_cache.k), (new_v, ref_cache.v)):
            d = np.abs(
                np.asarray(pool[:, b, :, p, :], np.int32)
                - np.asarray(ref_pool[:, b, :, p, :], np.int32)
            )
            # The kernel's bf16 matmul numerics shift the pre-quantization
            # row values by up to ~3% of amax vs the f32 XLA path (same
            # drift bound as the logits check above) → a few code units.
            assert d.max() <= 4, (b, d.max())
            assert (d <= 1).mean() > 0.9, (b, (d <= 1).mean())
        for sc, ref_sc in ((new_ks, ref_cache.k_scale), (new_vs, ref_cache.v_scale)):
            r = np.asarray(ref_sc[:, b, :, p], np.float32)
            g = np.asarray(sc[:, b, :, p], np.float32)
            np.testing.assert_allclose(g, r, rtol=0.02, atol=1e-5)


def test_megakernel_pos0_parity():
    """Fresh step at position 0 (no cache prefix): attention reduces to the
    self row only."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=5))
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    pos = jnp.zeros(1, jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    ref_logits, _ = qwen3_forward(config, weights, tok, cache, pos, mode="fast")
    got_logits, _, _ = _mega_step(config, weights, tok, cache, pos)
    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    assert np.abs(got - ref).max() / max(1.0, np.abs(ref).max()) < 0.03
    assert int(np.argmax(got)) == int(np.argmax(ref))


def test_q4_tiles_and_gates():
    """INT4 layer matrices tile at real model dims and the dispatch gate
    admits them (the classifier stays INT8 — docs/quantization.md)."""
    from qwen3_rs_tpu.testing import qwen3_config

    for dims in [
        (4096, 6144), (4096, 4096), (4096, 24576), (12288, 4096),  # 8B
        (1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024),  # 0.6B
    ]:
        assert _mk_tiles(*dims, 64, q4=True) is not None, dims
    import os

    # Q4 is opt-in (measured slower than the per-matrix Q4 path; see
    # megakernel_supported) — the gate must admit it only when asked.
    for name in ("0.6b", "4b", "8b"):
        big = qwen3_config(name, seq_len=1024)
        assert not megakernel_supported(big, 1024, jnp.dtype(jnp.bfloat16), q4=True)
        os.environ["QWEN3_TPU_MEGA_Q4"] = "1"
        try:
            assert megakernel_supported(
                big, 1024, jnp.dtype(jnp.bfloat16), q4=True
            ), name
        finally:
            del os.environ["QWEN3_TPU_MEGA_Q4"]
    # Odd group size can't nibble-pack.
    odd = dataclasses.replace(qwen3_config("8b", seq_len=1024), group_size=63)
    os.environ["QWEN3_TPU_MEGA_Q4"] = "1"
    try:
        assert not megakernel_supported(odd, 1024, jnp.dtype(jnp.bfloat16), q4=True)
    finally:
        del os.environ["QWEN3_TPU_MEGA_Q4"]


def test_megakernel_q4_decode_parity():
    """INT4 linear weights through the megakernel (interpret) match the
    per-matrix Q4 path: same unpack (group split-half nibbles), same
    bf16-dequant numerics."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=5, bits=4))
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 9)), jnp.int32)

    cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([9], jnp.int32)
    tok = jnp.asarray([[3]], jnp.int32)

    ref_logits, ref_cache = qwen3_forward(
        config, weights, tok, cache, pos, mode="fast"
    )
    got_logits, k_rows, v_rows = _mega_step(config, weights, tok, cache, pos)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 0.03
    assert int(np.argmax(got)) == int(np.argmax(ref))
    for got_rows, ref_rows in (
        (k_rows, ref_cache.k[:, 0, :, 9, :]),
        (v_rows, ref_cache.v[:, 0, :, 9, :]),
    ):
        r = np.asarray(ref_rows, np.float32)
        d = np.abs(np.asarray(got_rows, np.float32) - r)
        assert d.max() / max(1.0, np.abs(r).max()) < 0.03


def test_megakernel_masked_slot_past_window():
    """A masked slot whose scan-carried position reached/exceeded the
    window (serving decode chunks keep advancing pos for finished slots)
    must not disturb other rows and its clamped attention must produce
    finite output — the unclamped position used to size a cache-block DMA
    one block past the T axis."""
    from qwen3_rs_tpu.models.qwen3 import KVCache

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(5)
    B = 2
    shape = (config.n_layers, B, config.n_kv_heads, config.seq_len, config.head_dim)
    cache = KVCache(
        k=jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16),
        v=jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16),
    )
    T = config.seq_len
    pos = jnp.asarray([T + 7, 17], jnp.int32)  # row 0 past the window, masked
    mask = jnp.asarray([False, True])
    tok = jnp.asarray([[5], [9]], jnp.int32)

    got_logits, _, _ = _mega_step(config, weights, tok, cache, pos, write_mask=mask)
    ref_logits, _ = qwen3_forward(
        config, weights, tok, cache, jnp.asarray([17, 17], jnp.int32),
        mode="fast", write_mask=mask,
    )
    got = np.asarray(got_logits, np.float32)
    assert np.isfinite(got).all()
    # The live row (1) must match the reference regardless of row 0's junk.
    ref = np.asarray(ref_logits, np.float32)[1]
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got[1] - ref).max() / scale < 0.03


def test_megakernel_refuses_oob_position_ungated(monkeypatch):
    """Ungated dispatch (no write_mask) must refuse a host-visible
    position at/past the cache window instead of writing the K/V row out
    of bounds (the refusal fires before any kernel build, so the tiny CFG
    never reaches Mosaic)."""
    import qwen3_rs_tpu.ops.pallas as pallas_ops
    import qwen3_rs_tpu.ops.pallas.megakernel as mk

    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
    monkeypatch.setattr(mk, "megakernel_supported", lambda *a, **k: True)
    monkeypatch.setattr(pallas_ops, "pallas_enabled", lambda: True)
    tok = jnp.asarray([[42]], jnp.int32)
    for bad in (config.seq_len, config.seq_len + 5):
        with pytest.raises(ValueError, match="cache window"):
            qwen3_forward(
                config, weights, tok, cache,
                jnp.asarray([bad], jnp.int32), mode="fast",
            )


def test_megakernel_greedy_head_parity():
    """Fused greedy epilogue: the in-kernel argmax token must equal the
    argmax of the fused logits, and padded/masked columns must never win
    (checked by shrinking config.vocab_size below v_pad so cols >=
    vocab_size hold REAL random weights — an unmasked kernel would pick
    one with near-certainty)."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=3))
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 21)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.float32)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([21], jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    from qwen3_rs_tpu.ops.quant import QuantizedTensor, dequantize

    emb_q = weights.embed.q[tok]
    emb_s = weights.embed.scales[tok]
    x0 = dequantize(QuantizedTensor(emb_q, emb_s), jnp.float32)[:, 0, :]
    cos_t, sin_t = rope_table(cache.seq_len, config.head_dim, config.rope_theta)
    lw = weights.layers

    def run(cfg, greedy):
        return decode_stack_megakernel(
            cfg, x0, lw.rms_att, lw.rms_ffn, lw.q_norm, lw.k_norm,
            cos_t[pos], sin_t[pos], lw.wqkv, lw.wo, lw.w13, lw.w2,
            cache.k, cache.v, pos, weights.rms_final, weights.lm_head,
            eps=cfg.norm_eps, interpret=True, greedy=greedy,
        )[2]

    logits = np.asarray(run(config, False), np.float32)
    tok_full = np.asarray(run(config, True))
    assert tok_full.shape == (1,)
    assert int(tok_full[0]) == int(logits[0, : config.vocab_size].argmax())

    # Mask check: shrink vocab_size to 64 — cols 64..511 hold real random
    # weights whose max almost surely exceeds the first 64's.
    small = dataclasses.replace(config, vocab_size=64)
    tok_small = np.asarray(run(small, True))
    assert int(tok_small[0]) == int(logits[0, :64].argmax())
    assert int(tok_small[0]) < 64


def test_qwen3_forward_greedy_head_contract():
    """greedy_head returns identical tokens whether or not the megakernel
    engaged (tiny CFG runs the XLA fallback; parity with explicit argmax)."""
    config = CFG
    weights = cast_weight_scales(random_weights(config, seed=5))
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(1, config.vocab_size, (1, 9)), jnp.int32)
    cache = init_kv_cache(config, batch=1, dtype=jnp.bfloat16)
    _, cache = qwen3_forward(
        config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
        mode="fast", fresh_prefill=True,
    )
    pos = jnp.asarray([9], jnp.int32)
    tok = jnp.asarray([[3]], jnp.int32)
    logits, _ = qwen3_forward(config, weights, tok, cache, pos, mode="fast")
    toks, _ = qwen3_forward(
        config, weights, tok, cache, pos, mode="fast", greedy_head=True
    )
    assert toks.shape == (1,) and toks.dtype == jnp.int32
    assert int(toks[0]) == int(jnp.argmax(logits[0, : config.vocab_size]))
    with pytest.raises(ValueError, match="greedy_head"):
        qwen3_forward(
            config, weights, tok, cache, pos, mode="fast",
            greedy_head=True, skip_head=True,
        )
