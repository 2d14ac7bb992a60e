"""Accuracy bar measurement on an actually-exported checkpoint.

Builds a deterministic HF-format fixture at REAL Qwen3-0.6B body dims
(dim 1024 / hidden 3072 / 28 layers / 16q+8kv heads / head_dim 128; the
vocab is the synthetic fixture tokenizer's — no real weights exist on this
machine, zero egress), exports it INT8-g64 through the real exporter
pipeline, and records:

* ppl(fast W8A16) − ppl(f32)   [f32 = dequantized weights, full-f32 matmul]
* ppl(exact W8A8) − ppl(f32)
* PER-TENSOR reconstruction error vs the analytic half-step bound —
  asserted for every exported tensor (the bound-anchored claim that does
  not lean on fixture noise)
* logit-KL(f32 ‖ fast) and (f32 ‖ exact): distribution-level divergence,
  ≥ 0 by construction (fixture ppl deltas sit inside sampling noise and
  can go negative; KL cannot)
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
err_path = out_dir / "export_errors.json"
if not ckpt.exists():
    log("building HF fixture (0.6B dims, f32)...")
    # min_vocab: a larger fixture vocab (was 104) so per-token NLLs
    # average over a realistic label space instead of drowning in noise.
    hf_dir = make_hf_model_dir(
        out_dir, config=body, rng=np.random.default_rng(1234), min_vocab=4096
    )
    log("exporting INT8-g64...")
    from qwen3_rs_tpu.export import export_model

    err_report = export_model(str(hf_dir), str(ckpt), group_size=64)
    err_path.write_text(json.dumps(err_report))
log("loading exported checkpoint...")

# ---- per-tensor reconstruction error vs the analytic bound ----
err_report = json.loads(err_path.read_text())
violations = [r for r in err_report if r["max_err"] > r["bound"] * (1 + 1e-6)]
worst = max(
    (r["max_err"] / r["bound"] for r in err_report if r["bound"] > 0), default=0.0
)
assert not violations, f"reconstruction error exceeds analytic bound: {violations[:5]}"
log(f"per-tensor bound check: {len(err_report)} tensors, worst err/bound = {worst:.4f} — all within bound")

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

from qwen3_rs_tpu.evaluation import logit_kl

kl = {}
for mode in ("fast", "exact"):
    log(f"logit-KL(f32 ‖ {mode})...")
    kl[mode] = logit_kl(config, weights, eval_ids, mode_q=mode, window=512)
    log(f"  mean={kl[mode]['mean']:.6f} p99={kl[mode]['p99']:.6f} "
        f"max={kl[mode]['max']:.6f} nats over {kl[mode]['n_positions']} positions")

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
    "per_tensor_bound": {
        "tensors": len(err_report),
        "worst_err_over_bound": worst,
        "all_within_bound": True,
    },
    "logit_kl_f32_fast": kl["fast"],
    "logit_kl_f32_exact": kl["exact"],
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

# ---- 4. engaged-kernel record: which code paths this report covers ----
# (VERDICT r4 item 10: the committed accuracy must name the kernels that
# actually run for this config, so readers know what the numbers cover.)
from qwen3_rs_tpu.models.qwen3 import _xdot_prefill_wins
from qwen3_rs_tpu.ops.pallas.megakernel import megakernel_supported
import jax.numpy as _jnp

report["engaged_kernels"] = {
    "decode": (
        "megakernel" if megakernel_supported(config, 512, _jnp.bfloat16)
        else "per-matrix fused"
    ),
    "prefill": "rows (W8A16)",
    # The xdot auto gate excludes this fixture's w2 (dim 1024 -> 3.1M
    # weights < the 10M gate; measured LOSS at 0.6B dims) — xdot parity
    # at admitted dims is separately bounded in EVIDENCE §3 (rel <=0.041).
    "xdot_w2_engaged": _xdot_prefill_wins(
        2048, body.hidden_dim, body.dim, "auto"
    ),
}

# ---- 5. INT4 row: --bits 4 is a first-class export; bound + KL + golden ----
ckpt4 = out_dir / "m4.qtpu"
if not ckpt4.exists():
    log("exporting INT4-g64...")
    from qwen3_rs_tpu.export import export_model

    err4 = export_model(
        str(out_dir / "hf_model"), str(ckpt4), group_size=64, weight_bits=4
    )
    (out_dir / "export_errors_int4.json").write_text(json.dumps(err4))
err4 = json.loads((out_dir / "export_errors_int4.json").read_text())
viol4 = [r for r in err4 if r["max_err"] > r["bound"] * (1 + 1e-6)]
worst4 = max((r["max_err"] / r["bound"] for r in err4 if r["bound"] > 0), default=0.0)
assert not viol4, f"INT4 reconstruction error exceeds analytic bound: {viol4[:3]}"
log(f"INT4 per-tensor bound check: {len(err4)} tensors, worst err/bound = {worst4:.4f}")

config4, weights4 = load_checkpoint(str(ckpt4))
log("perplexity + KL [int4 fast]...")
r4 = compute_perplexity(config4, weights4, eval_ids, mode="fast", window=512)
kl4 = logit_kl(config4, weights4, eval_ids, mode_q="fast", window=512)
log(f"  ppl={r4.perplexity:.6f}  KL mean={kl4['mean']:.6f} max={kl4['max']:.6f}")
eng4 = Engine(str(ckpt4), mode="fast", ctx_length=128)
toks4 = generate(
    eng4, tokenizer, TokenSampler(0.0, 0.9, 9),
    "The quick brown fox jumps over the lazy dog", out=io.StringIO(),
)
report["int4"] = {
    "ppl_fast": r4.perplexity,
    "delta_vs_f32": r4.delta_vs(results["f32"]),
    "logit_kl_f32_fast": kl4,
    "per_tensor_bound": {
        "tensors": len(err4),
        "worst_err_over_bound": worst4,
        "all_within_bound": True,
    },
    "golden_fast": [int(t) for t in toks4[:32]],
}

(out_dir / "accuracy_report.json").write_text(json.dumps(report, indent=2))
print(json.dumps(report))
log("DONE")
