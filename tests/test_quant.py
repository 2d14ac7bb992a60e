"""Quantization unit tests, mirroring the reference's model_exporter tests
(qwen3-export/tests/unit/model_exporter_test.rs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_rs_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    dequantize_np,
    quantize_activations,
    quantize_weights,
    quantize_weights_np,
)


class TestWeightQuant:
    def test_known_values(self):
        # One group, max=4 → scale 4/127.
        w = np.array([1.0, -2.0, 3.0, -4.0], np.float32)
        q, s, err = quantize_weights_np(w, 4)
        assert s[0] == pytest.approx(4.0 / 127.0)
        np.testing.assert_array_equal(q, np.round(w / s[0]))
        assert err <= s[0] / 2 + 1e-7

    def test_bankers_rounding(self):
        # Values landing exactly on .5 must round half-to-even
        # (model_exporter.rs:320-338).
        scale = 1.0 / 127.0
        w = np.array([0.5 * scale, 1.5 * scale, 2.5 * scale, 127.0 * scale], np.float32)
        q, s, _ = quantize_weights_np(w, 4)
        assert s[0] == pytest.approx(scale)
        # 0.5→0, 1.5→2, 2.5→2 under banker's rounding.
        np.testing.assert_array_equal(q[:3], [0, 2, 2])

    def test_zero_group_scale_is_one(self):
        # All-zero group → scale 1.0 (model_exporter.rs:123).
        q, s, err = quantize_weights_np(np.zeros(8, np.float32), 4)
        np.testing.assert_array_equal(s, [1.0, 1.0])
        np.testing.assert_array_equal(q, np.zeros(8))
        assert err == 0.0

    def test_error_bound(self, rng):
        w = rng.normal(0, 1, 1024).astype(np.float32)
        q, s, err = quantize_weights_np(w, 64)
        # Max error bounded by half a quantization step per group.
        assert err <= float(np.max(s)) / 2 + 1e-6
        recon = dequantize_np(q, s)
        assert np.max(np.abs(recon - w)) == pytest.approx(err)

    def test_determinism(self, rng):
        w = rng.normal(0, 1, 256).astype(np.float32)
        a = quantize_weights_np(w, 64)
        b = quantize_weights_np(w, 64)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_invalid_size(self):
        with pytest.raises(ValueError):
            quantize_weights_np(np.zeros(10, np.float32), 4)

    def test_extreme_values(self):
        w = np.array([1e30, -1e30, 1e-30, 0.0], np.float32)
        q, s, _ = quantize_weights_np(w, 4)
        assert np.all(np.abs(q) <= 127)
        assert np.isfinite(s).all()

    def test_device_matches_host(self, rng):
        w = rng.normal(0, 1, (8, 128)).astype(np.float32)
        q_np, s_np, _ = quantize_weights_np(w, 32)
        qt = quantize_weights(jnp.asarray(w), 32)
        np.testing.assert_array_equal(np.asarray(qt.q), q_np)
        np.testing.assert_allclose(np.asarray(qt.scales), s_np, rtol=1e-7)


class TestActivationQuant:
    def test_zero_group_scale_is_zero(self):
        # Activation quant: zero group → scale 0.0, codes 0 (tensor.rs:110-116).
        qt = quantize_activations(jnp.zeros((1, 8)), 4)
        np.testing.assert_array_equal(np.asarray(qt.scales), np.zeros((1, 2)))
        np.testing.assert_array_equal(np.asarray(qt.q), np.zeros((1, 8)))

    def test_round_half_away(self):
        # Rust f32::round rounds half AWAY from zero (tensor.rs:116), unlike
        # the exporter's banker's rounding.
        scale = np.float32(2.0 / 127.0)
        x = jnp.array([[0.5 * scale, 1.5 * scale, 2.5 * scale, 127.0 * scale]])
        qt = quantize_activations(x, 4)
        np.testing.assert_array_equal(np.asarray(qt.q)[0, :3], [1, 2, 3])

    def test_round_trip(self, rng):
        x = rng.normal(0, 1, (4, 128)).astype(np.float32)
        qt = quantize_activations(jnp.asarray(x), 32)
        recon = np.asarray(dequantize(qt))
        step = np.repeat(np.asarray(qt.scales), 32, axis=-1)
        assert np.all(np.abs(recon - x) <= step / 2 + 1e-7)

    def test_parity_with_ref_engine(self, rng):
        from ref_engine import quantize_act

        x = rng.normal(0, 1, 256).astype(np.float32)
        q_ref, s_ref = quantize_act(x, 64)
        qt = quantize_activations(jnp.asarray(x), 64)
        np.testing.assert_array_equal(np.asarray(qt.q).reshape(-1), q_ref)
        np.testing.assert_allclose(np.asarray(qt.scales).reshape(-1), s_ref, rtol=1e-7)


def test_group_size_property():
    qt = QuantizedTensor(jnp.zeros((4, 64), jnp.int8), jnp.zeros((4, 4)))
    assert qt.group_size == 16
    assert qt.shape == (4, 64)
