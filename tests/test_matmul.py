"""Grouped quantized matmul tests: exact path vs the numpy reference engine,
fast path vs dense dequantized matmul.

Weight convention under test: in-major compute layout — codes [N, D],
scales [G, D] (ops/matmul.py); the reference comparisons quantize in the
canonical row-major [D, N] layout and transpose.
"""

import numpy as np
import jax.numpy as jnp

from ref_engine import matmul as ref_matmul, quantize_act as ref_quantize_act
from qwen3_rs_tpu.ops.matmul import dequant_weights, qmatmul, qmatmul_exact
from qwen3_rs_tpu.ops.quant import (
    QuantizedTensor,
    dequantize_np,
    quantize_activations,
    quantize_weights_np,
)


def _random_qw(rng, d, n, gs):
    """Returns the in-major QuantizedTensor plus canonical (q, s) arrays."""
    w = rng.normal(0, 0.3, (d, n)).astype(np.float32)
    q, s, _ = quantize_weights_np(w, gs)  # [D, N], [D, G]
    wt = QuantizedTensor(jnp.asarray(q.T.copy()), jnp.asarray(s.T.copy()))
    return wt, (q, s)


def test_exact_matches_reference(rng):
    n, d, gs = 128, 96, 32
    wq, (q_np, s_np) = _random_qw(rng, d, n, gs)
    x = rng.normal(0, 1, n).astype(np.float32)
    xq_ref, xs_ref = ref_quantize_act(x, gs)
    expected = ref_matmul(xq_ref, xs_ref, q_np, s_np, n, d, gs)

    xq = quantize_activations(jnp.asarray(x)[None, :], gs)
    out = np.asarray(qmatmul_exact(xq, wq))[0]
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_exact_batched(rng):
    n, d, gs, b = 64, 32, 16, 5
    wq, (q_np, s_np) = _random_qw(rng, d, n, gs)
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    xq = quantize_activations(jnp.asarray(x), gs)
    out = np.asarray(qmatmul_exact(xq, wq))
    for i in range(b):
        xq_ref, xs_ref = ref_quantize_act(x[i], gs)
        expected = ref_matmul(xq_ref, xs_ref, q_np, s_np, n, d, gs)
        np.testing.assert_allclose(out[i], expected, rtol=1e-5, atol=1e-5)


def test_exact_multidim_batch(rng):
    n, d, gs = 64, 32, 16
    wq, _ = _random_qw(rng, d, n, gs)
    x = rng.normal(0, 1, (2, 3, n)).astype(np.float32)
    xq = quantize_activations(jnp.asarray(x), gs)
    out = np.asarray(qmatmul_exact(xq, wq))
    assert out.shape == (2, 3, d)
    flat = np.asarray(
        qmatmul_exact(quantize_activations(jnp.asarray(x.reshape(6, n)), gs), wq)
    )
    np.testing.assert_allclose(out.reshape(6, d), flat, rtol=1e-6)


def test_fast_matches_dense(rng):
    n, d, gs = 256, 128, 64
    wq, (q_np, s_np) = _random_qw(rng, d, n, gs)
    x = rng.normal(0, 1, (4, n)).astype(np.float32)
    dense = dequantize_np(q_np, s_np)
    expected = x @ dense.T
    out = np.asarray(qmatmul(jnp.asarray(x), wq, use_pallas=False))
    np.testing.assert_allclose(out, expected, rtol=2e-2, atol=2e-2)


def test_dequant_weights(rng):
    n, d, gs = 64, 32, 16
    wq, (q_np, s_np) = _random_qw(rng, d, n, gs)
    dense = np.asarray(dequant_weights(wq, jnp.float32))  # [N, D]
    np.testing.assert_allclose(dense, dequantize_np(q_np, s_np).T, rtol=1e-6)


def test_pallas_interpret_matches_fast(rng):
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas, supports_shapes

    n, d, gs = 256, 128, 64
    assert supports_shapes(n, d, gs)
    wq, (q_np, s_np) = _random_qw(rng, d, n, gs)
    x = rng.normal(0, 1, (4, n)).astype(np.float32)
    # The kernel rounds activations to bf16 before the MXU dot (W8A16);
    # compare against a reference with the same input rounding so the
    # tolerance only has to cover dot/accumulation precision.
    x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    expected = x_bf @ dequantize_np(q_np, s_np).T
    # "defer" applies scales in f32 after exact int8-in-bf16 group dots —
    # near-exact vs the rounded-input reference.  "scale_w" also rounds the
    # dequantized weight product itself to bf16, hence the looser bound.
    out = np.asarray(qmatmul_pallas(jnp.asarray(x), wq, interpret=True, impl="defer"))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4, err_msg="defer")
    out = np.asarray(qmatmul_pallas(jnp.asarray(x), wq, interpret=True, impl="scale_w"))
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2, err_msg="scale_w")


def test_pallas_supports_shapes():
    from qwen3_rs_tpu.ops.pallas.qmatmul import supports_shapes

    assert supports_shapes(1024, 2048, 64)
    assert supports_shapes(1024, 151936, 64)  # 151936 = 128 × 1187
    assert not supports_shapes(64, 64, 16)  # tiny test models → XLA fallback


def test_pallas_rows_interpret_matches_fast(rng):
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked_rows,
        rows_supported,
    )
    from qwen3_rs_tpu.ops.quant import QuantizedTensor

    n, d, gs, b, L = 256, 256, 64, 256, 2
    assert rows_supported(n, d, gs, b)
    stacks = [_random_qw(rng, d, n, gs) for _ in range(L)]
    w_all = QuantizedTensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(np.float32))
    for layer in range(L):
        q_np, s_np = stacks[layer][1]
        expected = x_bf @ dequantize_np(q_np, s_np).T
        out = np.asarray(
            qmatmul_pallas_stacked_rows(
                jnp.asarray(x), w_all, layer, interpret=True, impl="scale_w"
            )
        )
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_pallas_rows_out_cols_matches_full(rng):
    """out_cols=(c0, dc) computes exactly that column slice of the full
    kernel output — the tp collective-matmul overlap building block."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_rows
    from qwen3_rs_tpu.ops.quant import QuantizedTensor

    n, d, gs, b, L = 256, 512, 64, 256, 2
    stacks = [_random_qw(rng, d, n, gs) for _ in range(L)]
    w_all = QuantizedTensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    x = jnp.asarray(rng.normal(0, 1, (b, n)).astype(np.float32))
    full = np.asarray(
        qmatmul_pallas_stacked_rows(x, w_all, 1, interpret=True, impl="scale_w")
    )
    for c0, dc in ((0, 256), (256, 256), (128, 128)):
        part = np.asarray(
            qmatmul_pallas_stacked_rows(
                x, w_all, 1, interpret=True, impl="scale_w", out_cols=(c0, dc)
            )
        )
        np.testing.assert_array_equal(part, full[:, c0 : c0 + dc])


def test_rows_supported_gates():
    from qwen3_rs_tpu.ops.pallas.qmatmul import rows_supported

    assert rows_supported(4096, 24576, 64, 1024)  # 8B w13 at 1k prefill
    assert rows_supported(12288, 4096, 64, 4096)  # 8B w2 at 4k prefill
    assert not rows_supported(4096, 24576, 64, 100)  # ragged rows → XLA


def test_dequant_pallas_stacked_interpret(rng):
    """The streaming dequant pass (xdot prefill path) reproduces the
    canonical dequantized weights for every stacked layer, both impls."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        dequant_pallas_stacked,
        dequant_supported,
    )

    n, d, gs, L = 256, 256, 64, 3
    assert dequant_supported(n, d, gs)
    stacks = [_random_qw(rng, d, n, gs) for _ in range(L)]
    w_all = QuantizedTensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    for layer in range(L):
        q_np, s_np = stacks[layer][1]
        expected = dequantize_np(q_np, s_np).T  # [N, D]
        for impl in ("f32", "bf16"):
            out = np.asarray(
                dequant_pallas_stacked(
                    w_all, layer, interpret=True, impl=impl
                ).astype(jnp.float32)
            )
            # bf16 output rounding dominates the tolerance.
            np.testing.assert_allclose(out, expected, rtol=1e-2, atol=1e-3)


def test_dequant_pallas_stacked_q4_interpret(rng):
    """INT4 variant of the dequant pass: unpacks the biased-v2 nibbles and
    reproduces the canonical Q4 dequantized weights."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        dequant_pallas_stacked,
        dequant_supported,
    )
    from qwen3_rs_tpu.ops.quant import Q4Tensor, dequantize_np

    n, d, gs, L = 256, 256, 64, 2
    assert dequant_supported(n, d, gs, q4=True)
    stacks = [_random_q4(rng, d, n, gs) for _ in range(L)]
    w_all = Q4Tensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    for layer in range(L):
        q_np, s_np = stacks[layer][1]
        expected = dequantize_np(q_np, s_np).T  # [N, D]
        out = np.asarray(
            dequant_pallas_stacked(w_all, layer, interpret=True).astype(jnp.float32)
        )
        np.testing.assert_allclose(out, expected, rtol=1e-2, atol=1e-3)


def test_xdot_prefill_crossover(monkeypatch):
    from qwen3_rs_tpu.models import qwen3 as m

    # auto = long prefill + large down-projection only (8B w2: 12288x4096)
    assert m._xdot_prefill_wins(4096, 12288, 4096, "auto")
    assert not m._xdot_prefill_wins(2048, 12288, 4096, "auto")  # short prefill
    assert not m._xdot_prefill_wins(4096, 4096, 24576, "auto")  # up-proj
    assert not m._xdot_prefill_wins(4096, 3072, 1024, "auto")  # 0.6B dims
    assert m._xdot_prefill_wins(4096, 9728, 2560, "auto")  # 4B w2
    assert m._xdot_prefill_wins(4096, 6144, 2048, "auto")  # 1.7B w2
    assert m._xdot_prefill_wins(512, 4096, 24576, "1")
    assert not m._xdot_prefill_wins(4096, 12288, 4096, "0")
    assert m._xdot_prefill_wins(4096, 12288, 4096, "w2")  # down-proj only
    assert not m._xdot_prefill_wins(4096, 4096, 24576, "w2")
    assert m._xdot_prefill_wins(4096, 4096, 24576, "big")
    monkeypatch.setattr(m, "_XDOT_PREFILL_MIN_ROWS", None)
    assert not m._xdot_prefill_wins(4096, 12288, 4096, "auto")


# ---------------------------------------------------------------------- INT4
def _random_q4(rng, d, n, gs):
    """In-major Q4Tensor (packed) plus canonical row-major (q, s) arrays."""
    from qwen3_rs_tpu.ops.quant import Q4Tensor, pack_q4_np, quantize_weights_q4_np

    w = rng.normal(0, 0.3, (d, n)).astype(np.float32)
    q, s, _ = quantize_weights_q4_np(w, gs)  # [D, N] codes in [-7, 7]
    packed = pack_q4_np(np.ascontiguousarray(q.T), gs)  # [N/2, D]
    return Q4Tensor(jnp.asarray(packed), jnp.asarray(s.T.copy())), (q, s)


def test_q4_pack_roundtrip(rng):
    from qwen3_rs_tpu.ops.quant import pack_q4_np, unpack_q4, unpack_q4_np

    codes = rng.integers(-7, 8, (3, 64, 16)).astype(np.int8)
    packed = pack_q4_np(codes, 16)
    assert packed.shape == (3, 32, 16) and packed.dtype == np.uint8
    np.testing.assert_array_equal(unpack_q4_np(packed, 16), codes)
    np.testing.assert_array_equal(
        np.asarray(unpack_q4(jnp.asarray(packed), 16, dtype=jnp.int32)), codes
    )


def test_q4_quantize_error_bound(rng):
    from qwen3_rs_tpu.ops.quant import quantize_weights_q4_np

    w = rng.normal(0, 0.5, (8, 128)).astype(np.float32)
    q, s, err = quantize_weights_q4_np(w, 32)
    assert q.min() >= -7 and q.max() <= 7
    # Per-group error bounded by half a quantization step.
    g = w.reshape(-1, 32)
    step = np.abs(g).max(axis=1) / 7.0
    assert err <= step.max() / 2 + 1e-6


def test_q4_dequant_project_matches_reference(rng):
    """XLA fallback path (_project with a Q4Tensor) vs numpy dequant."""
    from qwen3_rs_tpu.ops.quant import dequantize_q4_inmajor

    n, d, gs = 128, 64, 32
    w4, (q_np, s_np) = _random_q4(rng, d, n, gs)
    dense = np.asarray(dequantize_q4_inmajor(w4, jnp.float32))
    expected = dequantize_np(q_np, s_np).T
    np.testing.assert_allclose(dense, expected, rtol=1e-6, atol=1e-6)


def test_q4_pallas_interpret_matches_dense(rng):
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas, supports_shapes

    n, d, gs = 256, 128, 64
    assert supports_shapes(n, d, gs)
    w4, (q_np, s_np) = _random_q4(rng, d, n, gs)
    x = rng.normal(0, 1, (4, n)).astype(np.float32)
    x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    expected = x_bf @ dequantize_np(q_np, s_np).T
    out = np.asarray(qmatmul_pallas(jnp.asarray(x), w4, interpret=True))
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_q4_pallas_stacked_interpret(rng):
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked

    n, d, gs, L = 256, 128, 64, 2
    stacks = [_random_q4(rng, d, n, gs) for _ in range(L)]
    from qwen3_rs_tpu.ops.quant import Q4Tensor

    w_all = Q4Tensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    x = rng.normal(0, 1, (4, n)).astype(np.float32)
    x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(np.float32))
    for layer in range(L):
        q_np, s_np = stacks[layer][1]
        expected = x_bf @ dequantize_np(q_np, s_np).T
        out = np.asarray(
            qmatmul_pallas_stacked(jnp.asarray(x), w_all, layer, interpret=True)
        )
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_q4_pallas_rows_interpret(rng):
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked_rows,
        rows_supported,
    )
    from qwen3_rs_tpu.ops.quant import Q4Tensor

    n, d, gs, b, L = 256, 256, 64, 256, 2
    assert rows_supported(n, d, gs, b)
    stacks = [_random_q4(rng, d, n, gs) for _ in range(L)]
    w_all = Q4Tensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(np.float32))
    for layer in range(L):
        q_np, s_np = stacks[layer][1]
        expected = x_bf @ dequantize_np(q_np, s_np).T
        out = np.asarray(
            qmatmul_pallas_stacked_rows(jnp.asarray(x), w_all, layer, interpret=True)
        )
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def _random_stacked(rng, L, n, d, gs):
    import jax

    qs, ss = [], []
    for _ in range(L):
        w = rng.normal(0, 0.3, (d, n)).astype(np.float32)
        q, s, _ = quantize_weights_np(w, gs)
        qs.append(q.T.copy())
        ss.append(s.T.copy())
    return QuantizedTensor(
        jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ss))
    )


def test_fused_rms_prologue_interpret(rng):
    """Fused RMSNorm prologue == rms_norm then plain stacked kernel."""
    from qwen3_rs_tpu.ops.norms import rms_norm
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked,
        qmatmul_pallas_stacked_fused,
    )

    L, n, d, gs, b = 2, 256, 128, 64, 4
    w = _random_stacked(rng, L, n, d, gs)
    nw = (1.0 + 0.1 * rng.normal(0, 1, (L, n))).astype(np.float32)
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    for layer in (0, 1):
        fused = np.asarray(
            qmatmul_pallas_stacked_fused(
                jnp.asarray(x), w, layer, norm_w=jnp.asarray(nw), eps=1e-6,
                interpret=True,
            )
        )
        xn = rms_norm(jnp.asarray(x), jnp.asarray(nw[layer]), 1e-6)
        ref = np.asarray(qmatmul_pallas_stacked(xn, w, layer, interpret=True))
        np.testing.assert_allclose(fused, ref, rtol=2e-2, atol=2e-2)


def test_fused_swiglu_residual_interpret(rng):
    """Fused SwiGLU prologue + residual epilogue == XLA glue + kernel."""
    import jax

    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked,
        qmatmul_pallas_stacked_fused,
    )

    L, h, d, gs, b = 2, 256, 128, 64, 4
    w = _random_stacked(rng, L, h, d, gs)  # contraction = hidden
    gate_up = rng.normal(0, 1, (b, 2 * h)).astype(np.float32)
    res = rng.normal(0, 1, (b, d)).astype(np.float32)
    fused = np.asarray(
        qmatmul_pallas_stacked_fused(
            jnp.asarray(gate_up), w, 1, swiglu=True,
            residual=jnp.asarray(res), interpret=True,
        )
    )
    gate, up = gate_up[:, :h], gate_up[:, h:]
    hh = jnp.asarray(gate) * jax.nn.sigmoid(jnp.asarray(gate)) * jnp.asarray(up)
    ref = res + np.asarray(qmatmul_pallas_stacked(hh, w, 1, interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=2e-2, atol=2e-2)


def test_a8_rows_kernel_matches_exact(rng):
    """W8A8 rows kernel (per-group int8 MXU dots + reference-order f32
    epilogue) reproduces qmatmul_exact's scan numerics."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import (
        qmatmul_pallas_stacked_rows_a8,
        rows_a8_supported,
    )

    L, n, d, gs, b = 2, 256, 128, 64, 128
    assert rows_a8_supported(n, d, gs, b)
    w = _random_stacked(rng, L, n, d, gs)
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    xq = quantize_activations(jnp.asarray(x), gs)
    for layer in (0, 1):
        got = np.asarray(
            qmatmul_pallas_stacked_rows_a8(xq, w, layer, interpret=True)
        )
        w_l = QuantizedTensor(w.q[layer], w.scales[layer])
        want = np.asarray(qmatmul_exact(xq, w_l))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_a8_rows_kernel_from_raw_activations(rng):
    """Raw-activation entry quantizes per group in the wrapper (reference
    round-half-away) — equals quantize-then-exact."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked_rows_a8

    L, n, d, gs, b = 1, 256, 128, 64, 128
    w = _random_stacked(rng, L, n, d, gs)
    x = rng.normal(0, 1, (b, n)).astype(np.float32)
    got = np.asarray(
        qmatmul_pallas_stacked_rows_a8(jnp.asarray(x), w, 0, interpret=True)
    )
    xq = quantize_activations(jnp.asarray(x), gs)
    want = np.asarray(qmatmul_exact(xq, QuantizedTensor(w.q[0], w.scales[0])))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_a8_prefill_autoselect():
    """The auto policy engages the A8 rows kernel exactly at/above the
    measured crossover and respects the force-on/off overrides."""
    from qwen3_rs_tpu.models import qwen3 as m

    assert m._a8_prefill_wins(10_000, "1")
    assert not m._a8_prefill_wins(10_000, "0")
    orig = m._A8_PREFILL_MIN_ROWS
    try:
        m._A8_PREFILL_MIN_ROWS = None
        assert not m._a8_prefill_wins(1 << 20, "auto")
        m._A8_PREFILL_MIN_ROWS = 1024
        assert m._a8_prefill_wins(1024, "auto")
        assert not m._a8_prefill_wins(1023, "auto")
    finally:
        m._A8_PREFILL_MIN_ROWS = orig


def test_q4_dotbias_variant_matches(rng):
    """The "dotbias" unpack (unsigned nibbles + group-sum bias-correction
    dots) must match the default int path within its slightly looser
    rounding envelope (|u| <= 15 vs |code| <= 7 in the bf16 product)."""
    from qwen3_rs_tpu.ops.pallas.qmatmul import qmatmul_pallas_stacked

    n, d, gs, L = 256, 128, 64, 2
    stacks = [_random_q4(rng, d, n, gs) for _ in range(L)]
    from qwen3_rs_tpu.ops.quant import Q4Tensor

    w_all = Q4Tensor(
        jnp.stack([w.q for w, _ in stacks]), jnp.stack([w.scales for w, _ in stacks])
    )
    x = rng.normal(0, 1, (4, n)).astype(np.float32)
    for layer in range(L):
        base = np.asarray(
            qmatmul_pallas_stacked(
                jnp.asarray(x), w_all, layer, interpret=True, impl="int"
            )
        )
        got = np.asarray(
            qmatmul_pallas_stacked(
                jnp.asarray(x), w_all, layer, interpret=True, impl="dotbias"
            )
        )
        scale = max(1.0, np.abs(base).max())
        assert np.abs(got - base).max() / scale < 2e-2
        # And both against the exact dequantized reference.
        q_np, s_np = stacks[layer][1]
        x_bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
        expected = x_bf @ dequantize_np(q_np, s_np).T
        np.testing.assert_allclose(got, expected, rtol=5e-2, atol=0.25)
