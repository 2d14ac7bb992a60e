"""Shared test fixtures: synthetic HF model dirs, safetensors writer,
synthetic checkpoints/weights."""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig

TINY_CONFIG = ModelConfig(
    architecture_id=ARCHITECTURE_QWEN3,
    dim=64,
    hidden_dim=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=16,
    seq_len=64,
    vocab_size=96,
    group_size=16,
    shared_classifier=True,
)


def write_safetensors(path: Path, tensors: dict[str, np.ndarray], dtype: str = "F32"):
    """Minimal safetensors writer (F32 or BF16) for fixtures."""
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        if dtype == "F32":
            raw = arr.astype("<f4").tobytes()
        elif dtype == "BF16":
            raw = (arr.view(np.uint32) >> 16).astype("<u2").tobytes()
        else:
            raise ValueError(dtype)
        header[name] = {
            "dtype": dtype,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def make_hf_tensors(config: ModelConfig, rng, shared_classifier: bool = True, scale=0.05):
    """Random HF-named tensor dict for the synthetic model."""
    c = config
    t = {}
    t["model.embed_tokens.weight"] = rng.normal(0, scale, (c.vocab_size, c.dim))
    t["model.norm.weight"] = rng.normal(1, 0.02, (c.dim,))
    for l in range(c.n_layers):
        p = f"model.layers.{l}"
        t[f"{p}.input_layernorm.weight"] = rng.normal(1, 0.02, (c.dim,))
        t[f"{p}.post_attention_layernorm.weight"] = rng.normal(1, 0.02, (c.dim,))
        t[f"{p}.self_attn.q_norm.weight"] = rng.normal(1, 0.02, (c.head_dim,))
        t[f"{p}.self_attn.k_norm.weight"] = rng.normal(1, 0.02, (c.head_dim,))
        t[f"{p}.self_attn.q_proj.weight"] = rng.normal(0, scale, (c.all_heads_dim, c.dim))
        t[f"{p}.self_attn.k_proj.weight"] = rng.normal(0, scale, (c.kv_dim, c.dim))
        t[f"{p}.self_attn.v_proj.weight"] = rng.normal(0, scale, (c.kv_dim, c.dim))
        t[f"{p}.self_attn.o_proj.weight"] = rng.normal(0, scale, (c.dim, c.all_heads_dim))
        t[f"{p}.mlp.gate_proj.weight"] = rng.normal(0, scale, (c.hidden_dim, c.dim))
        t[f"{p}.mlp.down_proj.weight"] = rng.normal(0, scale, (c.dim, c.hidden_dim))
        t[f"{p}.mlp.up_proj.weight"] = rng.normal(0, scale, (c.hidden_dim, c.dim))
    if not shared_classifier:
        t["lm_head.weight"] = rng.normal(0, scale, (c.vocab_size, c.dim))
    return {k: v.astype(np.float32) for k, v in t.items()}


def make_tokenizer_json(min_vocab: int = 0) -> dict:
    """Synthetic tokenizer.json with a printable-ASCII byte-level vocab.

    ``min_vocab``: pad the vocab with filler entries up to this size
    (before the special tokens, so special ids stay the last five) — lets
    accuracy fixtures use a realistic label-space size."""
    vocab = {}
    tid = 0
    # single printable characters
    for b in range(33, 127):
        vocab[chr(b)] = tid
        tid += 1
    # Ġ = space in GPT-2 mapping
    vocab["Ġ"] = tid
    tid += 1
    merges = []
    for pair, merged in [("h e", "he"), ("l l", "ll"), ("he ll", "hell"), ("hell o", "hello")]:
        merges.append(pair)
        vocab[merged] = tid
        tid += 1
    while tid < min_vocab - 5:  # leave room for the 5 specials below
        vocab[f"zf{tid}"] = tid
        tid += 1
    special = ["<|im_start|>", "<|im_end|>", "<|endoftext|>", "<think>", "</think>"]
    added = []
    for s in special:
        added.append({"id": tid, "content": s})
        tid += 1
    return {
        "model": {"vocab": vocab, "merges": merges},
        "added_tokens": added,
        "n_tokens": tid,
    }


QWEN3_CHAT_TEMPLATE = (
    "{%- for message in messages %}<|im_start|>{{ message.role }}\n"
    "{{ message.content }}<|im_end|>\n{%- endfor %}"
    "{% if enable_thinking %}{% endif %}"
    "{% if messages[0].role == 'system' %}{% endif %}"
)


def make_hf_model_dir(
    tmp_path: Path,
    config: ModelConfig = TINY_CONFIG,
    rng=None,
    dtype: str = "F32",
    shared_classifier: bool = True,
    n_shards: int = 1,
    lora: dict | None = None,
    min_vocab: int = 0,
) -> Path:
    """Create a synthetic HF model directory (config.json, tokenizer.json,
    tokenizer_config.json, *.safetensors[, adapter files])."""
    rng = rng or np.random.default_rng(0)
    model_dir = tmp_path / "hf_model"
    model_dir.mkdir(parents=True, exist_ok=True)

    tok = make_tokenizer_json(min_vocab)
    vocab_size = tok.pop("n_tokens")
    import dataclasses

    config = dataclasses.replace(config, vocab_size=vocab_size)

    (model_dir / "config.json").write_text(
        json.dumps(
            {
                "architectures": ["Qwen3ForCausalLM"],
                "hidden_size": config.dim,
                "intermediate_size": config.hidden_dim,
                "num_hidden_layers": config.n_layers,
                "num_attention_heads": config.n_heads,
                "num_key_value_heads": config.n_kv_heads,
                "head_dim": config.head_dim,
                "vocab_size": config.vocab_size,
                "max_position_embeddings": config.seq_len,
                "rms_norm_eps": 1e-6,
                "rope_theta": 1000000.0,
                "bos_token_id": vocab_size - 3,
                "eos_token_id": vocab_size - 3,
            }
        )
    )
    (model_dir / "tokenizer.json").write_text(json.dumps(tok))
    (model_dir / "tokenizer_config.json").write_text(
        json.dumps({"chat_template": QWEN3_CHAT_TEMPLATE})
    )

    tensors = make_hf_tensors(config, rng, shared_classifier)
    names = sorted(tensors)
    shards = [names[i::n_shards] for i in range(n_shards)]
    for i, shard_names in enumerate(shards):
        write_safetensors(
            model_dir / f"model-{i:05d}.safetensors",
            {n: tensors[n] for n in shard_names},
            dtype=dtype,
        )

    if lora:
        (model_dir / "adapter_config.json").write_text(json.dumps(lora["config"]))
        write_safetensors(model_dir / "adapter_model.safetensors", lora["tensors"], dtype="F32")

    return model_dir
