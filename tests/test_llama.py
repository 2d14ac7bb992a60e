"""Llama-family architecture support (no QK-norm, config-driven rope theta).

The reference declares LlamaForCausalLM (id=2) but leaves it `todo!`
(qwen3-export/src/models/mod.rs:94); this framework implements it.
"""

import dataclasses
import json

import numpy as np
import jax.numpy as jnp
import pytest

from ref_engine import RefQwen3
from test_model_parity import make_weights
from utils import TINY_CONFIG, make_hf_model_dir

from qwen3_rs_tpu.checkpoint import load_checkpoint
from qwen3_rs_tpu.configuration import ARCHITECTURE_LLAMA, ModelConfig
from qwen3_rs_tpu.export import export_model
from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward

LLAMA_TINY = dataclasses.replace(
    TINY_CONFIG, architecture_id=ARCHITECTURE_LLAMA, use_qk_norm=False, rope_theta=5e5
)


def _llama_model_dir(tmp_path, rng):
    model_dir = make_hf_model_dir(tmp_path, rng=rng)
    cfg = json.loads((model_dir / "config.json").read_text())
    cfg["architectures"] = ["LlamaForCausalLM"]
    cfg["rope_theta"] = 500000.0
    (model_dir / "config.json").write_text(json.dumps(cfg))
    # Llama checkpoints carry no q_norm/k_norm tensors; the fixture includes
    # them but the exporter only reads names the architecture requests —
    # leave them in place (they are simply ignored for Llama? no: the
    # optional norm entries would load them).  Remove by re-writing the
    # safetensors without those tensors.
    import utils as U

    tensors = {}
    st = model_dir / "model-00000.safetensors"
    from qwen3_rs_tpu.export.tensor_reader import _SafetensorsFile

    f = _SafetensorsFile(st)
    for name in list(f.names()):
        if "q_norm" in name or "k_norm" in name:
            continue
        tensors[name] = np.asarray(f.load(name))
    f.close()
    U.write_safetensors(st, tensors)
    return model_dir


def test_no_qk_norm_in_forward():
    """With use_qk_norm=False the forward must match the reference engine
    with QK-norm skipped — and differ from the Qwen3-style forward."""
    rng = np.random.default_rng(31)
    np_w, weights = make_weights(LLAMA_TINY, rng)

    ref = RefQwen3(LLAMA_TINY, np_w)
    cache = init_kv_cache(LLAMA_TINY, 1)
    tokens = [3, 17, 42]
    for pos, tok in enumerate(tokens):
        ref_logits = ref.forward(tok, pos)
        logits, cache = qwen3_forward(
            LLAMA_TINY,
            weights,
            jnp.asarray([[tok]], jnp.int32),
            cache,
            jnp.asarray([pos], jnp.int32),
            mode="exact",
        )
        np.testing.assert_allclose(np.asarray(logits)[0], ref_logits, rtol=2e-4, atol=2e-4)

    # Multi-token window: with more than one key, attention weights depend
    # on q·k, so QK-norm must change the logits (at pos 0 a single key's
    # softmax is 1.0 regardless, hiding the difference).
    qwen_cfg = dataclasses.replace(LLAMA_TINY, use_qk_norm=True)
    window = jnp.asarray([[3, 17, 42, 5]], jnp.int32)
    cache_q = init_kv_cache(qwen_cfg, 1)
    logits_qwen, _ = qwen3_forward(
        qwen_cfg, weights, window, cache_q, jnp.zeros(1, jnp.int32), mode="exact"
    )
    cache_l = init_kv_cache(LLAMA_TINY, 1)
    logits_llama, _ = qwen3_forward(
        LLAMA_TINY, weights, window, cache_l, jnp.zeros(1, jnp.int32), mode="exact"
    )
    assert not np.allclose(np.asarray(logits_qwen), np.asarray(logits_llama), atol=1e-3)


@pytest.mark.parametrize("fmt", ["native", "legacy"])
def test_llama_export_roundtrip(tmp_path, fmt):
    model_dir = _llama_model_dir(tmp_path, np.random.default_rng(12))
    out = tmp_path / ("m.qtpu" if fmt == "native" else "m.bin")
    export_model(model_dir, out, group_size=16, fmt=fmt)
    config, weights = load_checkpoint(out)
    assert config.architecture_id == ARCHITECTURE_LLAMA
    assert config.use_qk_norm is False
    assert config.rope_theta == pytest.approx(500000.0)
    # Missing optional norms default to 1.0 vectors in the artifact
    # (model_exporter.rs:209-213) — present but unused at inference.
    np.testing.assert_array_equal(
        np.asarray(weights.layers.q_norm), np.ones_like(np.asarray(weights.layers.q_norm))
    )
    # Forward runs.
    cache = init_kv_cache(config, 1)
    logits, _ = qwen3_forward(
        config, weights, jnp.asarray([[1, 2]], jnp.int32), cache, jnp.zeros(1, jnp.int32)
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_extended_legacy_header_roundtrip():
    cfg = dataclasses.replace(
        LLAMA_TINY, norm_eps=1e-5, rope_theta=123456.0, use_qk_norm=False
    )
    parsed = ModelConfig.from_legacy_header(cfg.to_legacy_header())
    assert parsed.norm_eps == pytest.approx(1e-5)
    assert parsed.rope_theta == pytest.approx(123456.0)
    assert parsed.use_qk_norm is False


def test_legacy_header_without_extension_defaults():
    """A header whose padding is all zeros (e.g. written by the reference
    exporter) must still load; Llama id implies no QK-norm."""
    cfg = LLAMA_TINY
    raw = bytearray(cfg.to_legacy_header())
    raw[52:] = b"\x00" * (len(raw) - 52)  # wipe the extension block
    parsed = ModelConfig.from_legacy_header(bytes(raw))
    assert parsed.use_qk_norm is False
    assert parsed.rope_theta == pytest.approx(1e6)  # default
