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


def test_rows_supported_gates():
    from qwen3_rs_tpu.ops.pallas.qmatmul import rows_supported

    assert rows_supported(4096, 24576, 64, 1024)  # 8B w13 at 1k prefill
    assert rows_supported(12288, 4096, 64, 4096)  # 8B w2 at 4k prefill
    assert not rows_supported(4096, 24576, 64, 100)  # ragged rows → XLA
