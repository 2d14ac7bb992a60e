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
