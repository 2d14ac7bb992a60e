"""Perplexity evaluation tests."""

import json

import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG, make_hf_model_dir

from qwen3_rs_tpu.evaluation import compute_perplexity, evaluate_checkpoint


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)
    return config, weights


def test_perplexity_positive_and_finite(setup):
    config, weights = setup
    ids = list(np.random.default_rng(0).integers(0, config.vocab_size, 100))
    r = compute_perplexity(config, weights, ids, mode="fast")
    assert r.perplexity > 1.0
    assert np.isfinite(r.perplexity)
    assert r.n_tokens == 99


def test_windowing_consistency(setup):
    """Same stream, explicit window vs default must count the same tokens."""
    config, weights = setup
    ids = list(np.random.default_rng(1).integers(0, config.vocab_size, 80))
    r1 = compute_perplexity(config, weights, ids, mode="fast", window=40)
    assert r1.n_tokens == 79  # 1-token-overlap windows score every target
    r2 = compute_perplexity(config, weights, ids, mode="fast", window=64)
    assert r2.n_tokens == 79


def test_modes_agree_within_quant_noise(setup):
    """fast (W8A16) and exact (W8A8) and f32 must produce close ppl on a
    random tiny model — the quantization deltas are bounded."""
    config, weights = setup
    ids = list(np.random.default_rng(2).integers(0, config.vocab_size, 60))
    rs = {
        mode: compute_perplexity(config, weights, ids, mode=mode) for mode in
        ("fast", "exact", "f32")
    }
    ppl_f32 = rs["f32"].perplexity
    for mode in ("fast", "exact"):
        delta = abs(rs[mode].perplexity - ppl_f32)
        # Activation-quant/bf16 noise on an already-quantized random model is
        # small; assert a loose structural bound.
        assert delta / ppl_f32 < 0.05, (mode, rs[mode], ppl_f32)


def test_too_short_raises(setup):
    config, weights = setup
    with pytest.raises(ValueError):
        compute_perplexity(config, weights, [1], mode="fast")


def test_evaluate_checkpoint_cli_path(tmp_path):
    model_dir = make_hf_model_dir(tmp_path, rng=np.random.default_rng(4))
    out = tmp_path / "m.qtpu"
    from qwen3_rs_tpu.export import export_model

    export_model(model_dir, out, group_size=16, fmt="native")
    results = evaluate_checkpoint(out, text="hello world hello world hello", modes=("fast",))
    assert results["fast"].perplexity > 0

    from qwen3_rs_tpu.cli import main

    text_file = tmp_path / "eval.txt"
    text_file.write_text("hello world hello world hello world")
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["eval-ppl", str(out), "-f", str(text_file), "--modes", "fast,f32"])
    assert rc == 0
    payload = json.loads(buf.getvalue())
    assert "fast" in payload and "f32" in payload
    assert "ppl_delta_vs_f32" in payload["fast"]
