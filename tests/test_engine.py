"""Engine + generation-loop e2e tests on a synthetic exported checkpoint."""

import io

import jax
import numpy as np
import pytest

from utils import make_hf_model_dir

from qwen3_rs_tpu import InferenceConfig, run_inference
from qwen3_rs_tpu.inference import Engine, Tokenizer, TokenSampler, chat, generate


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(9))
    out = tmp / "m.qtpu"
    from qwen3_rs_tpu.export import export_model

    export_model(model_dir, out, group_size=16, fmt="native")
    legacy = tmp / "m.bin"
    export_model(model_dir, legacy, group_size=16, fmt="legacy")
    return out, legacy


@pytest.fixture(scope="module")
def engine(ckpt):
    return Engine(ckpt[0], mode="exact")


@pytest.fixture(scope="module")
def tokenizer(ckpt, engine):
    return Tokenizer(ckpt[0], engine.config.vocab_size)


class TestEngine:
    def test_config_loaded(self, engine):
        assert engine.config.group_size == 16
        assert engine.config.shared_classifier

    def test_legacy_checkpoint_loads_same(self, ckpt, engine):
        legacy_engine = Engine(ckpt[1], mode="exact")
        assert legacy_engine.config == engine.config
        cache_a = engine.new_cache(1)
        cache_b = legacy_engine.new_cache(1)
        toks = np.array([[3, 7, 11]], np.int32)
        la, _ = engine.prefill(cache_a, toks, np.zeros(1, np.int32))
        lb, _ = legacy_engine.prefill(cache_b, toks, np.zeros(1, np.int32))
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)

    def test_ctx_length_clamp(self, ckpt):
        e = Engine(ckpt[0], ctx_length=16)
        assert e.config.seq_len == 16
        e2 = Engine(ckpt[0], ctx_length=10**6)
        assert e2.config.seq_len == 64  # unchanged

    def test_decode_after_prefill_consistent(self, engine):
        """Bucketed prefill then decode must equal a longer prefill."""
        toks = [3, 7, 11, 2]
        cache = engine.new_cache(1)
        logits, cache = engine.prefill(cache, np.array([toks], np.int32), np.zeros(1, np.int32))
        nxt = 5
        logits_d, _ = engine.decode_step(cache, np.array([nxt]), np.array([len(toks)]))

        cache2 = engine.new_cache(1)
        logits_p, _ = engine.prefill(
            cache2, np.array([toks + [nxt]], np.int32), np.zeros(1, np.int32)
        )
        np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p), rtol=2e-4, atol=2e-4)

    def test_late_prefill_bucket_clamped_to_room(self, ckpt):
        """A continuation prefill near the end of the window must clamp its
        bucket to the remaining rows — a wider window would make the KV
        scatter's clamped dynamic_update_slice overwrite earlier cache rows."""
        e = Engine(ckpt[0], ctx_length=16, mode="exact")
        toks = [3, 7, 11]
        cache = e.new_cache(1)
        logits, cache = e.prefill(cache, np.array([toks], np.int32), np.zeros(1, np.int32))
        pos = len(toks)
        ref_cache = jax.tree.map(lambda a: a.copy(), cache)
        while pos < 13:
            logits, cache = e.decode_step(cache, np.array([5]), np.array([pos]))
            _, ref_cache = e.decode_step(ref_cache, np.array([5]), np.array([pos]))
            pos += 1
        # Continuation prefill of 2 tokens at pos 13 (bucket 32 > room 3).
        out, cache = e.prefill(cache, np.array([[9, 4]], np.int32), np.array([pos]))
        # Reference: the same two tokens fed through decode steps.
        _, ref_cache = e.decode_step(ref_cache, np.array([9]), np.array([pos]))
        ref, ref_cache = e.decode_step(ref_cache, np.array([4]), np.array([pos + 1]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

        # Overflow (window wider than the room) raises instead of corrupting.
        with pytest.raises(ValueError, match="does not fit"):
            e.prefill(cache, np.array([[1, 2, 3, 4]], np.int32), np.array([15]))

    def test_windowed_prefill_matches_single_shot(self, engine, monkeypatch):
        """Long prompts prefill in MAX_PREFILL_WINDOW chunks; logits must
        equal the one-window path (continuation windows attend the cache)."""
        rng = np.random.default_rng(0)
        toks = rng.integers(1, engine.config.vocab_size, 11).astype(np.int32)
        cache = engine.new_cache(1)
        ref, _ = engine.prefill(cache, toks[None], np.zeros(1, np.int32))

        monkeypatch.setattr(type(engine), "MAX_PREFILL_WINDOW", 4)
        cache2 = engine.new_cache(1)
        out, _ = engine.prefill(cache2, toks[None], np.zeros(1, np.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


class TestGenerate:
    def test_greedy_deterministic(self, engine, tokenizer):
        s1 = TokenSampler(0.0, 0.9, 1)
        s2 = TokenSampler(0.0, 0.9, 2)  # seed irrelevant at temp 0
        out1 = io.StringIO()
        out2 = io.StringIO()
        g1 = generate(engine, tokenizer, s1, "hello world", out=out1)
        g2 = generate(engine, tokenizer, s2, "hello world", out=out2)
        assert g1 == g2
        assert out1.getvalue() == out2.getvalue()
        assert out1.getvalue().startswith("hello world")

    def test_seeded_sampling_deterministic(self, engine, tokenizer):
        g1 = generate(engine, tokenizer, TokenSampler(0.8, 0.9, 42), "hi", out=io.StringIO())
        g2 = generate(engine, tokenizer, TokenSampler(0.8, 0.9, 42), "hi", out=io.StringIO())
        assert g1 == g2

    def test_empty_prompt_rejected(self, engine, tokenizer):
        with pytest.raises(ValueError, match="Please provide a prompt"):
            generate(engine, tokenizer, TokenSampler(0.0, 0.9, 1), "", out=io.StringIO())

    def test_respects_seq_len(self, ckpt, tokenizer):
        e = Engine(ckpt[0], ctx_length=12, mode="exact")
        out = io.StringIO()
        g = generate(e, tokenizer, TokenSampler(0.0, 0.9, 1), "hello", out=out)
        # ≤ seq_len total positions.
        assert len(g) <= 12

    def test_fast_mode_runs(self, ckpt, tokenizer):
        e = Engine(ckpt[0], mode="fast")
        g = generate(e, tokenizer, TokenSampler(0.0, 0.9, 1), "hello", out=io.StringIO())
        assert isinstance(g, list)

    def test_device_chunked_matches_host_greedy(self, ckpt, tokenizer):
        """The on-device chunked decode loop must reproduce the host
        step-by-step greedy path token for token."""
        e = Engine(ckpt[0], mode="fast")
        g_dev = generate(
            e, tokenizer, TokenSampler(0.0, 0.9, 1, device=True), "hello world", out=io.StringIO()
        )
        g_host = generate(
            e, tokenizer, TokenSampler(0.0, 0.9, 7, device=False), "hello world", out=io.StringIO()
        )
        assert g_dev == g_host

    def test_decode_chunk_api(self, ckpt):
        e = Engine(ckpt[0], mode="fast")
        cache = e.new_cache(1)
        logits, cache = e.prefill(cache, np.array([[3, 7]], np.int32), np.zeros(1, np.int32))
        first = int(np.argmax(np.asarray(logits)[0]))
        toks, cache = e.decode_chunk(cache, first, 2, 5)
        assert toks.shape == (5,)
        assert all(0 <= t < e.config.vocab_size for t in toks)


class TestChat:
    def test_single_shot_cli_prompt(self, engine, tokenizer):
        out = io.StringIO()
        chat(engine, tokenizer, TokenSampler(0.0, 0.9, 1), cli_user_prompt="hello", out=out)
        # Loop exits after the single CLI prompt is consumed.

    def test_system_prompt_renders(self, engine, tokenizer):
        from qwen3_rs_tpu.inference.generation import render_prompt

        r = render_prompt(0, "be nice", "hi", tokenizer)
        # Reference quirk: every %s gets "system\nuser" (generation.rs:188-195).
        assert "be nice\nhi" in r
        r2 = render_prompt(5, "be nice", "hi", tokenizer)
        assert r2 == tokenizer.prompt_template.replace("%s", "hi")

    def test_device_chunked_chat_matches_host_greedy(self, ckpt, tokenizer):
        """Greedy device-chunked assistant turns must print the same text
        as the per-token host path (device argmax == host argmax)."""
        e = Engine(ckpt[0], mode="fast")

        def run(device):
            out = io.StringIO()
            chat(
                e, tokenizer, TokenSampler(0.0, 0.9, 1, device=device),
                cli_user_prompt="hello there", out=out,
            )
            return out.getvalue()

        assert run(True) == run(False)

    def test_interactive_turns(self, engine, tokenizer):
        inputs = iter(["hello", ""])
        out = io.StringIO()
        chat(
            engine,
            tokenizer,
            TokenSampler(0.0, 0.9, 1),
            out=out,
            input_fn=lambda: next(inputs),
        )


class TestRunInference:
    def test_generate_mode(self, ckpt, capsys):
        run_inference(
            InferenceConfig(
                checkpoint_path=str(ckpt[0]),
                mode="generate",
                prompt="hello",
                temperature=0.0,
                seed=1,
                engine_mode="exact",
            )
        )
        assert "hello" in capsys.readouterr().out

    def test_unknown_mode(self, ckpt):
        with pytest.raises(ValueError, match="Unknown mode"):
            run_inference(
                InferenceConfig(checkpoint_path=str(ckpt[0]), mode="nope", seed=1)
            )


class TestInt4Engine:
    def test_int4_checkpoint_generates(self, ckpt, tokenizer, tmp_path_factory):
        """End-to-end: an INT4-exported checkpoint loads through the Engine
        and generates deterministically in fast mode."""
        tmp = tmp_path_factory.mktemp("engine_q4")
        model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(9))
        out = tmp / "m4.qtpu"
        from qwen3_rs_tpu.export import export_model

        export_model(model_dir, out, group_size=16, fmt="native", weight_bits=4)
        e = Engine(out, mode="fast")
        assert e.config.weight_bits == 4
        g1 = generate(e, tokenizer, TokenSampler(0.0, 0.9, 1), "hello", out=io.StringIO())
        g2 = generate(e, tokenizer, TokenSampler(0.0, 0.9, 1), "hello", out=io.StringIO())
        assert g1 == g2 and len(g1) > 0

    def test_int4_exact_mode_rejected(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("engine_q4x")
        model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(10))
        out = tmp / "m4.qtpu"
        from qwen3_rs_tpu.export import export_model

        export_model(model_dir, out, group_size=16, fmt="native", weight_bits=4)
        with pytest.raises(ValueError, match="INT4"):
            e = Engine(out, mode="exact")
            cache = e.new_cache(1)
            e.prefill(cache, np.array([[3, 7]], np.int32), np.zeros(1, np.int32))


class TestInt8KVCache:
    def test_int8_kv_greedy_matches_f32_cache(self, ckpt, tokenizer):
        """Dense INT8 KV cache (per-row scales) must reproduce the f32-cache
        greedy stream on short contexts."""
        base = Engine(ckpt[0], mode="fast")
        q8 = Engine(ckpt[0], mode="fast", cache_dtype="int8")
        g_base = generate(base, tokenizer, TokenSampler(0.0, 0.9, 1), "hello w",
                          out=io.StringIO())
        g_q8 = generate(q8, tokenizer, TokenSampler(0.0, 0.9, 1), "hello w",
                        out=io.StringIO())
        assert g_base == g_q8 and len(g_q8) > 0
