"""Accuracy bar measurement on an actually-exported checkpoint.

Builds a deterministic HF-format fixture at REAL Qwen3-0.6B body dims
(dim 1024 / hidden 3072 / 28 layers / 16q+8kv heads / head_dim 128; the
vocab is the synthetic fixture tokenizer's — no real weights exist on this
machine, zero egress), exports it INT8-g64 through the real exporter
pipeline, and records:

* ppl(fast W8A16) − ppl(f32)   [f32 = dequantized weights, full-f32 matmul]
* ppl(exact W8A8) − ppl(f32)
* the analytic g=64 group-quant error bound for context
* golden greedy token streams (fast/exact) for drift regression

Usage: python scripts/accuracy_report.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from qwen3_rs_tpu.utils import enable_compile_cache

enable_compile_cache()

out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/qacc")
out_dir.mkdir(parents=True, exist_ok=True)

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


# ---- 1. fixture at 0.6B body dims + export ----
import dataclasses

from utils import TINY_CONFIG, make_hf_model_dir

body = dataclasses.replace(
    TINY_CONFIG,
    dim=1024,
    hidden_dim=3072,
    n_layers=28,
    n_heads=16,
    n_kv_heads=8,
    head_dim=128,
    seq_len=2048,
    group_size=64,
)
ckpt = out_dir / "m.qtpu"
if not ckpt.exists():
    log("building HF fixture (0.6B dims, f32)...")
    hf_dir = make_hf_model_dir(out_dir, config=body, rng=np.random.default_rng(1234))
    log("exporting INT8-g64...")
    from qwen3_rs_tpu.export import export_model

    export_model(str(hf_dir), str(ckpt), group_size=64)
log("loading exported checkpoint...")

from qwen3_rs_tpu.checkpoint import load_checkpoint
from qwen3_rs_tpu.evaluation import compute_perplexity, quantization_error_bound
from qwen3_rs_tpu.inference.tokenizer import Tokenizer

config, weights = load_checkpoint(str(ckpt))
tokenizer = Tokenizer(str(ckpt), config.vocab_size)

# ---- 2. deterministic eval stream (tokenizer-real ids) ----
rng = np.random.default_rng(7)
eval_ids = rng.integers(3, config.vocab_size - 4, 1537).tolist()

results = {}
for mode in ("f32", "fast", "exact"):
    log(f"perplexity [{mode}]...")
    r = compute_perplexity(config, weights, eval_ids, mode=mode, window=512)
    results[mode] = r
    log(f"  ppl={r.perplexity:.6f} nll={r.avg_nll:.6f} over {r.n_tokens} tokens")

bound = quantization_error_bound(config)
report = {
    "config": "qwen3-0.6b-body (fixture vocab %d), INT8-g64 export" % config.vocab_size,
    "ppl_f32": results["f32"].perplexity,
    "ppl_fast": results["fast"].perplexity,
    "ppl_exact": results["exact"].perplexity,
    "delta_fast": results["fast"].delta_vs(results["f32"]),
    "delta_exact": results["exact"].delta_vs(results["f32"]),
    "g64_error_bound": bound,
    "n_tokens": results["f32"].n_tokens,
}

# ---- 3. golden greedy streams ----
import io

from qwen3_rs_tpu.inference import Engine, TokenSampler, generate

log("golden greedy streams...")
golden = {}
for mode in ("fast", "exact"):
    eng = Engine(str(ckpt), mode=mode, ctx_length=128)
    sampler = TokenSampler(0.0, 0.9, 9)
    toks = generate(
        eng, tokenizer, sampler,
        "The quick brown fox jumps over the lazy dog", out=io.StringIO(),
    )
    golden[mode] = [int(t) for t in toks[:32]]
    log(f"  {mode}: {golden[mode][:8]}...")
report["golden_fast"] = golden["fast"]
report["golden_exact"] = golden["exact"]

(out_dir / "accuracy_report.json").write_text(json.dumps(report, indent=2))
print(json.dumps(report))
log("DONE")
