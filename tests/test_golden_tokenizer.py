"""Golden tokenization against a realistic committed fixture.

``tests/fixtures/golden_tokenizer/tokenizer.json`` is a realistic
byte-level BPE tokenizer (full 256-byte alphabet via the GPT-2
byte→unicode map, merge products including multi-byte UTF-8 and emoji,
``<|...|>`` specials in added_tokens); ``golden.json`` holds committed
token-id vectors for tricky inputs.  Both the pure-Python and the C++
encoder must reproduce them exactly — this pins the reference encode
semantics (tokenizer.rs:165-237: special-token scan, unknown-char skip,
greedy merge loop) against a realistic vocabulary, where the synthetic
fixtures in utils.py only cover printable ASCII (SURVEY §7 "tokenizer
fidelity").

Regenerate with scripts/make_golden_tokenizer.py (only when deliberately
changing the fixture — the goldens are the contract).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from qwen3_rs_tpu.export.tokenizer_exporter import TokenizerExporter
from qwen3_rs_tpu.inference.tokenizer import Tokenizer

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "golden_tokenizer"


@pytest.fixture(scope="module")
def golden():
    return json.loads((FIXTURE_DIR / "golden.json").read_text())


@pytest.fixture(scope="module")
def tok(tmp_path_factory, golden):
    tmp = tmp_path_factory.mktemp("golden_tok")
    TokenizerExporter().export_tokenizer(
        FIXTURE_DIR,
        tmp / "m.bin.tokenizer",
        golden["bos_token_id"],
        golden["eos_token_id"],
    )
    return Tokenizer(tmp / "m.bin", golden["n_tokens"])


def test_header(tok, golden):
    assert tok.vocab_size == golden["n_tokens"]
    assert tok.bos_token_id == golden["bos_token_id"]
    assert tok.eos_token_id == golden["eos_token_id"]
    # Byte-alphabet ids 0..255 export to their raw byte values.
    for b in (0, 9, 10, 32, 65, 127, 128, 160, 173, 255):
        assert tok.vocab[b] == bytes([b])


def test_golden_python_encoder(tok, golden):
    for case in golden["cases"]:
        assert tok._encode_py(case["text"]) == case["ids"], repr(case["text"])


def test_golden_native_encoder(tok, golden):
    from qwen3_rs_tpu.utils.native import NativeBpeEncoder, load_library

    if load_library() is None:
        pytest.skip("native library unavailable")
    native = NativeBpeEncoder(tok.vocab, tok.merge_scores, tok.max_token_length)
    for case in golden["cases"]:
        assert native.encode(case["text"]) == case["ids"], repr(case["text"])


def test_decode_round_trip(tok, golden):
    """Inputs without unknown characters decode back exactly."""
    for case in golden["cases"]:
        text = case["text"]
        if text == "Ġ":  # the one deliberately-unknown input
            continue
        assert tok.decode(case["ids"]) == text, repr(text)


# Independent hand-derived spot checks: expected ids written from the vocab
# layout (ids 0..255 = bytes; merge products numbered in merge order from
# 256), NOT regenerated from the encoder — they catch a systematically
# wrong generator as well as encoder regressions.
HAND_CASES = [
    # "hello": he(256)→ll? no: greedy loop merges first mergeable pair
    # each round: h+e→he(256); he+l? no; l+l→ll(257); he+ll→hell(258);
    # hell+o→hello(259).
    ("hello", [259]),
    # Capital H never merges (no uppercase merges in the fixture).
    ("Ha", [ord("H"), ord("a")]),
    # Multi-byte: 世(296) 界(298) merge to 世界(299).
    ("世界", [299]),
    # Special scan: <|endoftext|> is added_tokens id 307 (= 256 + 44
    # unique merge products + 7 specials, first special).
    ("<|endoftext|>", [307]),
    # "tab\there": t+a? no; a+b? no; b+\t? no; \t+h? no; h+e→he(256);
    # then no pair mergeable ("er" exists as 282 but e went into "he";
    # r+e is not a token) → [t, a, b, \t, he, r, e].
    ("tab\there", [116, 97, 98, 9, 256, 114, 101]),
]


@pytest.mark.parametrize("text,ids", HAND_CASES)
def test_hand_derived(tok, text, ids):
    assert tok._encode_py(text) == ids
