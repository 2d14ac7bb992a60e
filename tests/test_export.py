"""Export pipeline tests: HF fixture dir → checkpoint artifacts, both
formats, with round-trip verification (the reference's strongest test idea,
SURVEY §4)."""

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from utils import TINY_CONFIG, make_hf_model_dir, make_hf_tensors, write_safetensors

from qwen3_rs_tpu.checkpoint import load_legacy, load_native
from qwen3_rs_tpu.configuration import read_config
from qwen3_rs_tpu.export import export_model, load_model_info
from qwen3_rs_tpu.export.model_exporter import find_optimal_group_size
from qwen3_rs_tpu.export.tensor_reader import TensorReader, bf16_to_f32


class TestTensorReader:
    def test_f32_and_bf16(self, tmp_path, rng):
        w = rng.normal(0, 1, (8, 16)).astype(np.float32)
        write_safetensors(tmp_path / "a.safetensors", {"x": w}, dtype="F32")
        reader = TensorReader(tmp_path)
        np.testing.assert_array_equal(reader.load_tensor("x"), w)

        write_safetensors(tmp_path / "a.safetensors", {"x": w}, dtype="BF16")
        reader = TensorReader(tmp_path)
        got = reader.load_tensor("x")
        np.testing.assert_allclose(got, w, rtol=1e-2)

    def test_missing_returns_none(self, tmp_path, rng):
        write_safetensors(tmp_path / "a.safetensors", {"x": np.zeros((2, 2), np.float32)})
        reader = TensorReader(tmp_path)
        assert reader.load_tensor("nope") is None

    def test_multi_shard_search(self, tmp_path, rng):
        a = rng.normal(0, 1, (4,)).astype(np.float32)
        b = rng.normal(0, 1, (4,)).astype(np.float32)
        write_safetensors(tmp_path / "s1.safetensors", {"a": a})
        write_safetensors(tmp_path / "s2.safetensors", {"b": b})
        reader = TensorReader(tmp_path)
        np.testing.assert_array_equal(reader.load_tensor("a"), a)
        np.testing.assert_array_equal(reader.load_tensor("b"), b)

    def test_no_files_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            TensorReader(tmp_path)

    def test_bf16_conversion_exact(self):
        # 1.0 in bf16 is 0x3F80.
        np.testing.assert_array_equal(
            bf16_to_f32(np.array([0x3F80, 0x0000, 0xBF80], np.uint16)),
            np.array([1.0, 0.0, -1.0], np.float32),
        )


class TestConfigLoader:
    def test_happy_path(self, tmp_path, rng):
        model_dir = make_hf_model_dir(tmp_path, rng=rng)
        info = load_model_info(model_dir)
        assert info.config.dim == TINY_CONFIG.dim
        assert info.config.architecture_id == 1
        assert not info.is_lora

    def test_invalid_json(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "config.json").write_text("{not json")
        with pytest.raises(json.JSONDecodeError):
            load_model_info(d)

    def test_missing_required_field(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "config.json").write_text(json.dumps({"hidden_size": 64}))
        with pytest.raises(ValueError, match="missing fields"):
            load_model_info(d)

    def test_head_dim_defaults(self, tmp_path, rng):
        model_dir = make_hf_model_dir(tmp_path, rng=rng)
        cfg = json.loads((model_dir / "config.json").read_text())
        del cfg["head_dim"]
        (model_dir / "config.json").write_text(json.dumps(cfg))
        info = load_model_info(model_dir)
        assert info.config.head_dim == cfg["hidden_size"] // cfg["num_attention_heads"]

    def test_lora_detection(self, tmp_path, rng):
        lora = {
            "config": {"lora_alpha": 16.0, "r": 4, "target_modules": ["q_proj"]},
            "tensors": {},
        }
        model_dir = make_hf_model_dir(tmp_path, rng=rng, lora=lora)
        info = load_model_info(model_dir)
        assert info.is_lora
        assert info.lora.lora_alpha == 16.0
        assert info.lora.r == 4

    def test_lora_only_dir_rejected(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "adapter_config.json").write_text("{}")
        with pytest.raises(FileNotFoundError, match="Only LoRA config"):
            load_model_info(d)


def test_find_optimal_group_size():
    # (model_exporter_test.rs group-size optimization table)
    assert find_optimal_group_size(1024, 64) == 64
    assert find_optimal_group_size(96, 64) == 32  # 64∤96 → halve → 32|96


def test_find_optimal_group_size_exact_semantics():
    # while size >= 4 and dim % size: size //= 2
    def ref(dim, req):
        size = min(req, dim)
        while size >= 4 and dim % size != 0:
            size //= 2
        return max(size, 4)

    for dim in [64, 96, 100, 1024, 151936, 7]:
        for req in [4, 8, 64, 128, 1000]:
            assert find_optimal_group_size(dim, req) == ref(dim, req)


class TestExportRoundTrip:
    @pytest.fixture(scope="class")
    def exported(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("export")
        rng = np.random.default_rng(11)
        model_dir = make_hf_model_dir(tmp, rng=rng, dtype="BF16", n_shards=2)
        native_out = tmp / "model.qtpu"
        legacy_out = tmp / "model.bin"
        export_model(model_dir, native_out, group_size=16, fmt="native")
        export_model(model_dir, legacy_out, group_size=16, fmt="legacy")
        return model_dir, native_out, legacy_out

    def test_native_structure(self, exported):
        _, native_out, _ = exported
        assert (native_out / "config.json").exists()
        assert (native_out / "tokenizer.bin").exists()
        assert (native_out / "template").exists()
        assert (native_out / "weights" / "embed.q.npy").exists()

    def test_legacy_artifacts(self, exported):
        _, _, legacy_out = exported
        assert legacy_out.exists()
        assert Path(str(legacy_out) + ".tokenizer").exists()
        assert Path(str(legacy_out) + ".template").exists()

    def test_legacy_header(self, exported):
        _, _, legacy_out = exported
        config = read_config(legacy_out)
        assert config.dim == TINY_CONFIG.dim
        assert config.group_size == 16
        assert config.shared_classifier  # no separate lm_head in fixture

    def test_formats_agree(self, exported):
        """Native and legacy checkpoints must decode to identical weights."""
        _, native_out, legacy_out = exported
        cfg_n, w_n = load_native(native_out)
        cfg_l, w_l = load_legacy(legacy_out)
        assert cfg_n.dim == cfg_l.dim
        assert cfg_n.shared_classifier == cfg_l.shared_classifier

        np.testing.assert_array_equal(np.asarray(w_n.embed.q), np.asarray(w_l.embed.q))
        np.testing.assert_array_equal(
            np.asarray(w_n.embed.scales), np.asarray(w_l.embed.scales)
        )
        for field in ["wqkv", "wo", "w13", "w2"]:
            qn = getattr(w_n.layers, field)
            ql = getattr(w_l.layers, field)
            np.testing.assert_array_equal(np.asarray(qn.q), np.asarray(ql.q))
            np.testing.assert_array_equal(np.asarray(qn.scales), np.asarray(ql.scales))
        for field in ["rms_att", "rms_ffn", "q_norm", "k_norm"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(w_n.layers, field)), np.asarray(getattr(w_l.layers, field))
            )
        np.testing.assert_array_equal(np.asarray(w_n.rms_final), np.asarray(w_l.rms_final))

    def test_v1_row_major_checkpoints_still_load(self, exported, tmp_path):
        """Checkpoints written before the in-major v2 layout (no _layout
        marker, linear layers stored row-major) must load identically."""
        import shutil

        from qwen3_rs_tpu.checkpoint import IN_MAJOR_TENSORS, LAYOUT_MARKER, WEIGHTS_DIR

        _, native_out, _ = exported
        v1 = tmp_path / "v1.qtpu"
        shutil.copytree(native_out, v1)
        (v1 / WEIGHTS_DIR / LAYOUT_MARKER).unlink()
        for name in IN_MAJOR_TENSORS:
            for suffix in (".q", ".s"):
                p = v1 / WEIGHTS_DIR / f"{name}{suffix}.npy"
                arr = np.load(p)
                np.save(p, np.ascontiguousarray(np.swapaxes(arr, -1, -2)))

        cfg2, w2 = load_native(v1)
        _, w_ref = load_native(native_out)
        for field in ["wqkv", "wo", "w13", "w2"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(w2.layers, field).q),
                np.asarray(getattr(w_ref.layers, field).q),
            )
            np.testing.assert_array_equal(
                np.asarray(getattr(w2.layers, field).scales),
                np.asarray(getattr(w_ref.layers, field).scales),
            )

    def test_quantization_against_source(self, exported):
        """Exported codes must reconstruct the HF tensors within g-quant error."""
        model_dir, native_out, _ = exported
        from qwen3_rs_tpu.ops.quant import dequantize_np

        cfg, w = load_native(native_out)
        reader = TensorReader(model_dir)
        src = reader.load_tensor("model.layers.0.self_attn.q_proj.weight")
        # In-memory layout is in-major; transpose back to compare row-major.
        ah = cfg.all_heads_dim
        q0 = np.asarray(w.layers.wqkv.q)[0][:, :ah].T
        s0 = np.asarray(w.layers.wqkv.scales)[0][:, :ah].T
        got = dequantize_np(q0, s0)
        step = np.repeat(s0, cfg.group_size, axis=-1)
        assert np.all(np.abs(got - src) <= step / 2 + 1e-7)

    def test_tokenizer_binary_roundtrip(self, exported):
        """Header + per-token records (tokenizer_exporter_test.rs:377-493)."""
        model_dir, native_out, _ = exported
        data = (native_out / "tokenizer.bin").read_bytes()
        max_len, bos, eos = struct.unpack_from("<III", data)
        tok_json = json.loads((model_dir / "tokenizer.json").read_text())
        vocab = dict(tok_json["model"]["vocab"])
        for t in tok_json["added_tokens"]:
            vocab[t["content"]] = t["id"]
        assert max_len == max(len(t) for t in vocab)

        # Walk all records; ids are dense, ordered by id.
        off = 12
        count = 0
        tokens = []
        while off < len(data):
            score, ln = struct.unpack_from("<fI", data, off)
            off += 8
            tokens.append((score, data[off : off + ln]))
            off += ln
            count += 1
        assert count == len(vocab)
        by_id = sorted((tid, tok) for tok, tid in vocab.items())
        # 'Ġ' maps to the space byte under the GPT-2 byte map.
        gid = vocab["Ġ"]
        assert tokens[gid][1] == b" "
        # Special tokens keep their literal bytes.
        sid = vocab["<|im_start|>"]
        assert tokens[sid][1] == b"<|im_start|>"
        # All real tokens carry the default score (see tokenizer_exporter.py).
        assert tokens[by_id[0][0]][0] == pytest.approx(-1e6)

    def test_template_contents(self, exported):
        _, native_out, legacy_out = exported
        basic = (native_out / "template").read_text()
        assert basic == "<|im_start|>user\n%s<|im_end|>\n<|im_start|>assistant\n<think>\n\n</think>\n\n"
        thinking = (native_out / "template.with-thinking").read_text()
        assert thinking == "<|im_start|>user\n%s<|im_end|>\n<|im_start|>assistant\n"
        assert (native_out / "template.with-system").read_text().count("%s") == 2
        # Legacy uses sibling-file naming.
        assert Path(str(legacy_out) + ".template").read_text() == basic


class TestLoRAExport:
    def test_merge_applied(self, tmp_path, rng):
        cfg = TINY_CONFIG
        rank, alpha = 2, 8.0
        a = rng.normal(0, 0.1, (rank, cfg.dim)).astype(np.float32)
        b = rng.normal(0, 0.1, (cfg.all_heads_dim, rank)).astype(np.float32)
        lora = {
            "config": {
                "lora_alpha": alpha,
                "r": rank,
                "target_modules": ["q_proj"],
                "base_model_name_or_path": "base",
            },
            "tensors": {
                "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
                "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
            },
        }
        model_dir = make_hf_model_dir(tmp_path, rng=rng, lora=lora)
        out = tmp_path / "m.qtpu"
        export_model(model_dir, out, group_size=16, fmt="native")

        from qwen3_rs_tpu.ops.quant import dequantize_np

        _, w = load_native(out)
        reader = TensorReader(model_dir)
        base = reader.load_tensor("model.layers.0.self_attn.q_proj.weight")
        expected = base + (alpha / rank) * (b @ a)
        ah = TINY_CONFIG.all_heads_dim
        q0 = np.asarray(w.layers.wqkv.q)[0][:, :ah].T
        s0 = np.asarray(w.layers.wqkv.scales)[0][:, :ah].T
        got = dequantize_np(q0, s0)
        step = np.repeat(s0, 16, axis=-1)
        assert np.all(np.abs(got - expected) <= step / 2 + 1e-6)
        # Layer 1 (no adapters) must be untouched base quantization.
        base1 = reader.load_tensor("model.layers.1.self_attn.q_proj.weight")
        q1 = np.asarray(w.layers.wqkv.q)[1][:, :ah].T
        s1 = np.asarray(w.layers.wqkv.scales)[1][:, :ah].T
        got1 = dequantize_np(q1, s1)
        assert np.all(np.abs(got1 - base1) <= np.repeat(s1, 16, axis=-1) / 2 + 1e-7)


class TestInt4Export:
    def test_int4_roundtrip_and_accuracy(self, tmp_path):
        """--bits 4 export: loader yields Q4Tensors whose dequantized values
        reconstruct the HF tensors within the INT4 group-quant bound, and
        the model generates."""
        import jax.numpy as jnp

        from qwen3_rs_tpu.ops.quant import Q4Tensor, dequantize_q4_inmajor

        rng = np.random.default_rng(21)
        model_dir = make_hf_model_dir(tmp_path, rng=rng)
        out = tmp_path / "m4.qtpu"
        export_model(model_dir, out, group_size=16, weight_bits=4)

        config, weights = load_native(out)
        assert config.weight_bits == 4
        for field in ("wqkv", "wo", "w13", "w2"):
            assert isinstance(getattr(weights.layers, field), Q4Tensor), field
        # Embeddings / classifier stay INT8.
        assert weights.embed.q.dtype == jnp.int8
        assert weights.lm_head.q.dtype == jnp.int8

        # Reconstruction accuracy: dequantized wo tracks the HF source
        # within half an int4 step per group.
        from qwen3_rs_tpu.export.tensor_reader import TensorReader

        src = TensorReader(model_dir).load_tensor(
            "model.layers.0.self_attn.o_proj.weight"
        )  # [dim, AH]
        deq = np.asarray(dequantize_q4_inmajor(weights.layers.wo))[0]  # [AH, dim]
        step = np.abs(src.reshape(-1, 16)).max(axis=1) / 7.0
        err = np.abs(deq.T - src).reshape(-1, 16)
        assert (err <= step[:, None] / 2 + 1e-6).all()

        # End-to-end: fast-mode forward produces finite logits.
        from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward

        cache = init_kv_cache(config, 1)
        logits, _ = qwen3_forward(
            config, weights, jnp.asarray([[1, 2, 3]], jnp.int32), cache,
            jnp.zeros(1, jnp.int32), mode="fast",
        )
        assert np.isfinite(np.asarray(logits)).all()

    def test_int4_legacy_rejected(self, tmp_path):
        rng = np.random.default_rng(22)
        model_dir = make_hf_model_dir(tmp_path, rng=rng)
        with pytest.raises(ValueError, match="legacy"):
            export_model(model_dir, tmp_path / "m.bin", group_size=16,
                         fmt="legacy", weight_bits=4)
