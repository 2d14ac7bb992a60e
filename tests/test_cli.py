"""CLI surface tests (argument handling + end-to-end subcommands)."""

import contextlib
import io
import json

import numpy as np
import pytest

from utils import make_hf_model_dir

from qwen3_rs_tpu.cli import build_parser, main, validate_export_dir


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    model_dir = make_hf_model_dir(tmp, rng=np.random.default_rng(6))
    out = tmp / "m.qtpu"
    with contextlib.redirect_stdout(io.StringIO()):
        rc = main(["export", str(model_dir), str(out), "-g", "16"])
    assert rc == 0
    return tmp, model_dir, out


class TestParser:
    def test_export_flags(self):
        args = build_parser().parse_args(["export", "a", "b", "-g", "32", "--format", "legacy"])
        assert args.group_size == 32
        assert args.format == "legacy"

    def test_inference_flags_match_reference(self):
        # Same short flags as qwen3-cli (main.rs:36-93).
        args = build_parser().parse_args(
            ["inference", "ck", "-t", "0.5", "-p", "0.8", "-s", "9", "-c", "128",
             "-m", "generate", "-i", "hi", "-y", "sys", "-r", "1"]
        )
        assert (args.temperature, args.topp, args.seed) == (0.5, 0.8, 9)
        assert args.context == 128 and args.mode == "generate"
        assert args.reasoning == 1

    def test_bad_mode_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["inference", "ck", "-m", "bogus"])

    def test_validate_export_dir(self, tmp_path):
        with pytest.raises(SystemExit, match="not a directory"):
            validate_export_dir(tmp_path / "missing")
        d = tmp_path / "m"
        d.mkdir()
        with pytest.raises(SystemExit, match="missing"):
            validate_export_dir(d)


class TestSubcommands:
    def test_generate(self, ckpt, capsys):
        _, _, out = ckpt
        rc = main(["inference", str(out), "-m", "generate", "-i", "hello", "-t", "0.0",
                   "-s", "1", "--engine-mode", "fast"])
        assert rc == 0
        assert "hello" in capsys.readouterr().out

    def test_generate_sp_matches_single_chip(self, ckpt, capsys, monkeypatch):
        """--sp routes long-enough fresh prefills through ring attention on
        a CPU sp mesh; greedy output must match the single-chip run."""
        import qwen3_rs_tpu.parallel.context as ctx

        _, _, out = ckpt
        prompt = "hello world " * 4  # encodes past the tiny threshold below
        base_args = ["inference", str(out), "-m", "generate", "-i", prompt,
                     "-t", "0.0", "-s", "1", "--engine-mode", "fast"]
        assert main(base_args) == 0
        want = capsys.readouterr().out

        calls = {"n": 0}
        ring_inner = ctx.ring_prefill_attention_inner

        def counting(*a, **kw):
            calls["n"] += 1
            return ring_inner(*a, **kw)

        monkeypatch.setattr(ctx, "ring_prefill_attention_inner", counting)
        assert main(base_args + ["--sp", "4", "--sp-threshold", "8"]) == 0
        got = capsys.readouterr().out
        assert calls["n"] > 0, "--sp never reached the ring prefill path"
        assert got == want
        assert prompt in got

    def test_batch(self, ckpt):
        tmp, _, out = ckpt
        pf = tmp / "prompts.txt"
        pf.write_text("hello world\nabc\n")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["batch", str(out), "-f", str(pf), "-n", "4", "--slots", "2"])
        assert rc == 0
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert [l["id"] for l in lines] == [0, 1]
        assert all(l["tokens"] <= 4 for l in lines)

    def test_eval_ppl(self, ckpt):
        tmp, _, out = ckpt
        tf = tmp / "text.txt"
        tf.write_text("hello world hello world hello")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["eval-ppl", str(out), "-f", str(tf), "--modes", "fast"])
        assert rc == 0
        assert "perplexity" in buf.getvalue()
