"""C++ BPE encoder vs the pure-Python implementation: identical token ids on
every input (including multi-byte UTF-8, special tokens, and fuzz)."""

import numpy as np
import pytest

from utils import make_hf_model_dir

from qwen3_rs_tpu.inference.tokenizer import Tokenizer
from qwen3_rs_tpu.utils.native import NativeBpeEncoder, load_library


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ntok")
    model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(5))
    out = tmp / "m.qtpu"
    from qwen3_rs_tpu.export import export_model

    export_model(model_dir, out, group_size=16, fmt="native")
    import json

    vocab_size = json.loads((model_dir / "config.json").read_text())["vocab_size"]
    return Tokenizer(out, vocab_size)


@pytest.fixture(scope="module")
def native(tok):
    if load_library() is None:
        pytest.skip("native library unavailable")
    return NativeBpeEncoder(tok.vocab, tok.merge_scores, tok.max_token_length)


CASES = [
    "hello world!",
    "hello",
    "<|im_start|>user\nhello<|im_end|>",
    "<zz> not special",
    "a b c",
    "",
    "he said: hello hello hello",
    "<<>>",
    "x" * 200,
    "é unknown chars é",
]


@pytest.mark.parametrize("text", CASES)
def test_matches_python(tok, native, text):
    assert native.encode(text) == tok._encode_py(text), repr(text)


def test_fuzz_matches_python(tok, native):
    rng = np.random.default_rng(7)
    alphabet = list("abcdefgh <|>imstarenduk_!")
    for _ in range(50):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert native.encode(text) == tok._encode_py(text), repr(text)


def test_tokenizer_uses_native_when_available(tok):
    if load_library() is None:
        pytest.skip("native library unavailable")
    enc = tok._native_encoder()
    assert enc is not None
    assert tok.encode("hello world") == tok._encode_py("hello world")


class TestNativeTranspose:
    """csrc/host_io.cpp blocked transpose vs numpy (loader hot path)."""

    @pytest.mark.parametrize(
        "shape,dtype",
        [
            ((3, 100, 257), np.int8),
            ((5, 64, 64), np.float32),
            ((1000, 4096), np.int8),
            ((2, 1, 129, 7), np.int8),
            ((1, 1), np.float32),
        ],
    )
    def test_matches_numpy(self, shape, dtype):
        from qwen3_rs_tpu.utils.native import native_transpose

        rng = np.random.default_rng(11)
        a = (
            rng.integers(-128, 128, size=shape).astype(dtype)
            if dtype == np.int8
            else rng.standard_normal(shape).astype(dtype)
        )
        out = native_transpose(a)
        if load_library() is None:
            assert out is None
            return
        np.testing.assert_array_equal(out, np.swapaxes(a, -1, -2))
        assert out.flags.c_contiguous

    def test_unsupported_returns_none(self):
        from qwen3_rs_tpu.utils.native import native_transpose

        assert native_transpose(np.zeros(4, np.int8)) is None  # 1-D
        assert native_transpose(np.zeros((2, 2), np.int16)) is None  # dtype

    def test_loader_path_uses_it(self):
        """_transpose_qt must produce the same layout either way."""
        from qwen3_rs_tpu.checkpoint import _transpose_qt

        rng = np.random.default_rng(3)
        q = rng.integers(-128, 128, size=(4, 32, 48)).astype(np.int8)
        s = rng.standard_normal((4, 32, 3)).astype(np.float32)
        q_t, s_t = _transpose_qt(q, s)
        np.testing.assert_array_equal(q_t, np.swapaxes(q, -1, -2))
        np.testing.assert_array_equal(s_t, np.swapaxes(s, -1, -2))
