"""Generate the committed golden-tokenization fixture.

Builds a realistic byte-level BPE ``tokenizer.json`` — full 256-entry
byte alphabet (GPT-2 byte→unicode mapping), English merge products,
multi-byte UTF-8 merge products (CJK, accented latin, emoji), and
``<|...|>`` special tokens via ``added_tokens`` — then exports it through
the tokenizer exporter and records golden token-id vectors for a suite of
tricky inputs, encoded by the Python reference-parity encoder.

The goldens pin the reference encode semantics (tokenizer.rs:165-237):
special-token ``<...>`` scan bounded by max_token_length, per-character
byte lookups with unknown characters skipped, and the greedy
first-mergeable-pair merge loop (all real vocab tokens share
DEFAULT_SCORE — the reference's merge-score lookup quirk, documented in
export/tokenizer_exporter.py).

Output: tests/fixtures/golden_tokenizer/{tokenizer.json,golden.json}.
Run from the repo root:  python scripts/make_golden_tokenizer.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from qwen3_rs_tpu.export.tokenizer_exporter import gpt2_unicode_to_byte_map

OUT_DIR = REPO / "tests" / "fixtures" / "golden_tokenizer"

# byte value -> GPT-2 unicode char (forward map; exporter holds the inverse)
B2U = {v: k for k, v in gpt2_unicode_to_byte_map().items()}


def u(text: str | bytes) -> str:
    """Real text (or raw bytes) → token string in GPT-2 unicode space."""
    raw = text.encode("utf-8") if isinstance(text, str) else text
    return "".join(B2U[b] for b in raw)


# Merge products, in rank order.  Pairs are (left, right) in REAL text
# space; both sides and the concatenation become vocab entries when not
# already present.  Chosen to cover: Ġ-prefixed word tokens, common
# English bigrams, words built from multi-step merges, multi-byte UTF-8
# (é = 2 bytes, 世/界 = 3 bytes, 🚀 = 4 bytes) split across merges.
MERGES_TEXT = [
    ("h", "e"),          # he
    ("l", "l"),          # ll
    ("he", "ll"),        # hell
    ("hell", "o"),       # hello
    (" ", "h"),          # Ġh
    ("ll", "o"),         # llo
    ("e", "llo"),        # ello
    (" h", "ello"),      # Ġhello
    ("t", "h"),          # th
    ("th", "e"),         # the
    (" ", "t"),          # Ġt
    (" t", "he"),        # Ġthe
    ("i", "n"),          # in
    ("in", "g"),         # ing
    ("a", "n"),          # an
    ("an", "d"),         # and
    (" ", "a"),          # Ġa
    ("n", "d"),          # nd
    (" a", "nd"),        # Ġand
    ("o", "r"),          # or
    ("w", "or"),         # wor
    ("l", "d"),          # ld
    ("wor", "ld"),       # world
    (" ", "w"),          # Ġw
    ("or", "ld"),        # orld
    (" w", "orld"),      # Ġworld
    ("e", "r"),          # er
    ("e", "s"),          # es
    ("o", "n"),          # on
    ("a", "t"),          # at
    ("i", "s"),          # is
    (" ", "i"),          # Ġi
    (" i", "s"),         # Ġis
    ("c", "a"),          # ca
    ("ca", "f"),         # caf
    (b"\xc3", b"\xa9"),  # é from its UTF-8 bytes
    ("caf", "é"),        # café
    (" ", "caf"),        # Ġcaf
    (" caf", "é"),       # Ġcafé
    (b"\xe4", b"\xb8"),      # 世 byte pieces
    (b"\xe4\xb8", b"\x96"),
    (b"\xe7", b"\x95"),      # 界 byte pieces
    (b"\xe7\x95", b"\x8c"),
    ("世", "界"),         # multi-byte CJK merge
    (b"\xf0", b"\x9f"),      # 🚀 byte pieces (4-byte UTF-8)
    (b"\x9a", b"\x80"),
    (b"\xf0\x9f", b"\x9a\x80"),
    ("🚀", "🚀"),         # emoji pair
    ("\n", "\n"),        # double newline (common in chat templates)
    (" ", " "),          # double space
    ("  ", "  "),        # 4-space indent
]

SPECIAL_TOKENS = [
    "<|endoftext|>",
    "<|im_start|>",
    "<|im_end|>",
    "<think>",
    "</think>",
    "<|object_ref_start|>",
    "<|object_ref_end|>",
]

# Golden inputs: cover the special-token scan, unknown-character skip,
# multi-byte UTF-8, merge chains, and template-shaped text.
GOLDEN_TEXTS = [
    "hello",
    "hello world",
    "Hello, world!",            # capital H: no merges defined, stays bytes
    "the thing in the world",
    " hello",                   # leading space → Ġhello token
    "café",
    " café au lait",
    "世界",
    "世界 world 世界",
    "a🚀b",
    "🚀🚀🚀",                    # pair merge + single
    "<|im_start|>user\nhello<|im_end|>\n",
    "<|im_start|>system\nyou are helpful<|im_end|>\n<|im_start|>user\nhi<|im_end|>\n",
    "<think>\n\n</think>",
    "a < b > c",                # '<' with no special match
    "x<unknown>y",              # <...> scanned but not in vocab
    "<<>>",
    "<|endoftext|>",
    "",
    "   indented\n\n  code",
    "llllll",
    "and and and",
    "is it the thing? it is.",
    "Ġ",                        # literal U+0120: unknown char, skipped
    "tab\there",
    "mixed 世 and é and 🚀 end",
]


def build_tokenizer_json() -> dict:
    vocab: dict[str, int] = {}
    tid = 0
    # ids 0..255: the full byte alphabet in byte order (realistic layout).
    for b in range(256):
        vocab[B2U[b]] = tid
        tid += 1

    merges: list[str] = []
    for left, right in MERGES_TEXT:
        lt, rt = u(left), u(right)
        merged = lt + rt
        for part in (lt, rt):
            if part not in vocab:
                raise ValueError(
                    f"merge side {part!r} (from {left!r}+{right!r}) not in "
                    "vocab yet — reorder MERGES_TEXT"
                )
        merges.append(f"{lt} {rt}")
        if merged not in vocab:
            vocab[merged] = tid
            tid += 1

    added = [{"id": tid + i, "content": s} for i, s in enumerate(SPECIAL_TOKENS)]
    tid += len(SPECIAL_TOKENS)

    return {
        "version": "1.0",
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
        "added_tokens": added,
        "n_tokens": tid,
    }


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    tok_json = build_tokenizer_json()
    n_tokens = tok_json.pop("n_tokens")

    (OUT_DIR / "tokenizer.json").write_text(
        json.dumps(tok_json, indent=1, ensure_ascii=False)
    )

    # Export through the real pipeline, then encode the goldens with the
    # pure-Python encoder.
    import tempfile

    from qwen3_rs_tpu.export.tokenizer_exporter import TokenizerExporter
    from qwen3_rs_tpu.inference.tokenizer import Tokenizer

    eot = next(t["id"] for t in tok_json["added_tokens"] if t["content"] == "<|endoftext|>")
    with tempfile.TemporaryDirectory() as td:
        bin_path = Path(td) / "m.bin.tokenizer"
        TokenizerExporter().export_tokenizer(OUT_DIR, bin_path, eot, eot)
        tok = Tokenizer(Path(td) / "m.bin", n_tokens)

    cases = []
    for text in GOLDEN_TEXTS:
        ids = tok._encode_py(text)
        cases.append({"text": text, "ids": ids})
        print(f"{text!r:70s} -> {ids}")

    golden = {
        "n_tokens": n_tokens,
        "bos_token_id": eot,
        "eos_token_id": eot,
        "cases": cases,
    }
    (OUT_DIR / "golden.json").write_text(json.dumps(golden, indent=1, ensure_ascii=False))
    print(f"\nwrote {OUT_DIR}/tokenizer.json ({n_tokens} tokens) and golden.json "
          f"({len(cases)} cases)")


if __name__ == "__main__":
    main()
