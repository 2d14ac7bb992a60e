"""Tokenizer tests: binary loading, encode/decode semantics, templates."""

import numpy as np
import pytest

from utils import make_hf_model_dir

from qwen3_rs_tpu.export import export_model
from qwen3_rs_tpu.inference.tokenizer import Tokenizer, Utf8StreamDecoder


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tok")
    model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(5))
    out = tmp / "m.qtpu"
    export_model(model_dir, out, group_size=16, fmt="native")
    import json

    vocab_size = json.loads((model_dir / "config.json").read_text())["vocab_size"]
    return out, vocab_size


@pytest.fixture(scope="module")
def tok(ckpt):
    out, vocab_size = ckpt
    return Tokenizer(out, vocab_size)


class TestLoading:
    def test_header(self, tok):
        assert tok.bos_token_id == tok.eos_token_id  # fixture uses same id
        assert tok.max_token_length >= len("<|im_start|>")

    def test_templates_loaded(self, tok):
        assert "%s" in tok.prompt_template
        assert "<think>" in tok.prompt_template  # thinking disabled variant

    def test_thinking_variant(self, ckpt):
        out, vocab_size = ckpt
        t = Tokenizer(out, vocab_size, enable_thinking=True)
        assert "<think>" not in t.prompt_template


class TestEncodeDecode:
    def test_roundtrip_ascii(self, tok):
        text = "hello world!"
        ids = tok.encode(text)
        assert ids
        assert tok.decode(ids) == text

    def test_merges_applied(self, tok):
        # 'hello' exists as a merged token in the fixture vocab; greedy
        # first-pair merging must collapse it to few tokens.
        ids = tok.encode("hello")
        assert len(ids) < 5

    def test_special_token_scan(self, tok):
        ids = tok.encode("<|im_start|>user")
        # First token must be the special token as one unit.
        assert tok.decode_bytes(ids[0]) == b"<|im_start|>"

    def test_unknown_special_falls_through(self, tok):
        # "<nope>" is not in vocab: chars are encoded individually.
        ids = tok.encode("<zz>")
        assert tok.decode(ids) == "<zz>"

    def test_unknown_char_skipped(self, tok):
        # fixture vocab has no 'é' and no fallback byte tokens.
        ids = tok.encode("aéb")
        assert tok.decode(ids) == "ab"

    def test_space_via_gpt2_byte(self, tok):
        ids = tok.encode("a b")
        assert tok.decode(ids) == "a b"

    def test_matches_naive_reference_encode(self, tok):
        """Cross-check against a direct transliteration of tokenizer.rs
        (O(vocab) scans and all)."""

        def ref_encode(text):
            tokens = []
            chars = list(text)
            i = 0
            while i < len(chars):
                found = False
                if chars[i] == "<":
                    end = None
                    for j in range(i + 1, min(len(chars), i + tok.max_token_length)):
                        if chars[j] == ">":
                            end = j
                            break
                    if end is not None:
                        sp = "".join(chars[i : end + 1]).encode()
                        for tid, tb in enumerate(tok.vocab):
                            if tb == sp:
                                tokens.append(tid)
                                i = end + 1
                                found = True
                                break
                if not found:
                    cb = chars[i].encode()
                    for tid, tb in enumerate(tok.vocab):
                        if tb == cb:
                            tokens.append(tid)
                            break
                    i += 1
            while True:
                best_score, best_id, best_idx = -1e10, None, None
                for k in range(len(tokens) - 1):
                    merged = tok.vocab[tokens[k]] + tok.vocab[tokens[k + 1]]
                    for tid, tb in enumerate(tok.vocab):
                        if tb == merged:
                            if tok.merge_scores[tid] > best_score:
                                best_score = tok.merge_scores[tid]
                                best_id, best_idx = tid, k
                            break
                if best_id is None:
                    break
                tokens[best_idx] = best_id
                del tokens[best_idx + 1]
            return tokens

        for text in ["hello world!", "<|im_start|>hi<|im_end|>", "he said: hello", "a"]:
            assert tok.encode(text) == ref_encode(text), text

    def test_decode_out_of_range(self, tok):
        assert tok.decode_bytes(10**6) == b""

    def test_termination(self, tok):
        assert tok.is_termination(tok.eos_token_id)
        assert not tok.is_termination(0)


class TestUtf8Stream:
    def test_multibyte_across_tokens(self):
        d = Utf8StreamDecoder()
        emoji = "🎉".encode()
        assert d.push(emoji[:2]) == ""
        assert d.push(emoji[2:]) == "🎉"

    def test_ascii_passthrough(self):
        d = Utf8StreamDecoder()
        assert d.push(b"hi") == "hi"
        assert d.flush() == ""

    def test_flush_replaces_invalid(self):
        d = Utf8StreamDecoder()
        d.push(b"\xf0\x9f")
        assert d.flush() != ""
