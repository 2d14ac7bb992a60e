"""Command-line interface: ``export`` and ``inference`` subcommands.

Capability parity with qwen3-cli/src/main.rs — same subcommands, same flags
(short and long), same model-directory validation; plus TPU-native flags
(--format, --engine-mode).  The reference's ``--context`` u32/usize clap
panic (main.rs:72 vs :150, flagged in SURVEY §2.3) is deliberately not
replicated.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="qwen3-tpu",
        description="TPU-native Qwen3 INT8 export and inference",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    # export MODEL_PATH OUTPUT_PATH --group-size/-g (main.rs:10-33)
    exp = sub.add_parser("export", help="Export HF model to quantized checkpoint")
    exp.add_argument("model_path", help="Path to the HF model directory")
    exp.add_argument("output_path", help="Output checkpoint path")
    exp.add_argument(
        "-g", "--group-size", type=int, default=64, help="Quantization group size (default 64)"
    )
    exp.add_argument(
        "--format",
        choices=["native", "legacy"],
        default="native",
        help="native = TPU checkpoint directory (default); legacy = reference .bin",
    )
    exp.add_argument(
        "--bits",
        type=int,
        choices=[8, 4],
        default=8,
        help="linear-layer code width: 8 = Q8_0 (reference scheme, default); "
        "4 = nibble-packed INT4 (native format only — halves the decode "
        "weight stream; embeddings/classifier stay INT8)",
    )

    # inference checkpoint -t -p -s -c -m -i -y -r (main.rs:36-93)
    inf = sub.add_parser("inference", help="Run inference on a checkpoint")
    inf.add_argument("checkpoint", help="Checkpoint (native directory or legacy .bin)")
    inf.add_argument("-t", "--temperature", type=float, default=1.0)
    inf.add_argument("-p", "--topp", type=float, default=0.9, help="top-p (nucleus) threshold")
    inf.add_argument("-s", "--seed", type=int, default=None)
    inf.add_argument("-c", "--context", type=int, default=None, help="context window override")
    inf.add_argument("-m", "--mode", choices=["generate", "chat"], default="chat")
    inf.add_argument("-i", "--input", default=None, help="input prompt")
    inf.add_argument("-y", "--system", default=None, help="system prompt (chat mode)")
    inf.add_argument(
        "-r",
        "--reasoning",
        type=int,
        choices=[0, 1],
        default=0,
        help="reasoning mode: 0=no thinking, 1=thinking",
    )
    inf.add_argument(
        "--engine-mode",
        choices=["fast", "exact"],
        default="fast",
        help="fast = W8A16 + Pallas kernels; exact = reference-parity W8A8",
    )
    inf.add_argument(
        "--device-sampling",
        action="store_true",
        help="sample on the TPU instead of the host xorshift sampler",
    )
    inf.add_argument(
        "--kv-int8",
        action="store_true",
        help="INT8 KV cache with per-row scales: halves cache reads "
        "(long-context decode is KV-bound)",
    )
    inf.add_argument(
        "--spec", type=int, default=0, metavar="K",
        help="n-gram speculative decoding with K-token drafts (greedy-exact; "
        "requires -t 0, generate mode; device sampling is auto-enabled)",
    )
    inf.add_argument(
        "--sp", type=int, default=1, metavar="N",
        help="sequence-parallel prefill over N devices: prompts of at least "
        "--sp-threshold rows run ring attention over an sp mesh (long "
        "prompts whose score memory outgrows one chip); decode stays "
        "single-chip",
    )
    inf.add_argument(
        "--sp-threshold", type=int, default=4096, metavar="ROWS",
        help="minimum prompt rows to engage the sequence-parallel prefill",
    )

    # batch: continuous-batching throughput runner (serving surface).
    bt = sub.add_parser("batch", help="Serve a batch of prompts with continuous batching")
    bt.add_argument("checkpoint")
    bt.add_argument(
        "-f", "--file", required=True, help="text file: one prompt per line"
    )
    bt.add_argument("-n", "--max-new-tokens", type=int, default=128)
    bt.add_argument("-t", "--temperature", type=float, default=0.0)
    bt.add_argument("-p", "--topp", type=float, default=0.9)
    bt.add_argument("-s", "--seed", type=int, default=0)
    bt.add_argument("--slots", type=int, default=8, help="concurrent decode slots")
    bt.add_argument(
        "--sampling", choices=["host", "device"], default="device",
        help="host = reference-parity xorshift; device = chunked on-TPU sampling",
    )
    bt.add_argument(
        "--no-warmup", action="store_true",
        help="skip ahead-of-time compilation (TTFT stats will include compiles)",
    )
    bt.add_argument(
        "--kv", choices=["dense", "paged"], default="dense",
        help="KV cache layout: dense slots or a shared page pool",
    )
    bt.add_argument(
        "--page-size", type=int, default=128, help="rows per KV page (paged only)"
    )
    bt.add_argument(
        "--pages", type=int, default=None,
        help="KV pool size in pages (paged only; default: half the dense footprint)",
    )
    bt.add_argument(
        "--spec", type=int, default=0, metavar="K",
        help="n-gram speculative decoding: every slot verifies K drafts per "
        "round, distribution-exact at any temperature (paged + device "
        "sampling only; sync scheduling)",
    )
    bt.add_argument(
        "--prefix-cache", action="store_true",
        help="reuse KV pages across requests sharing a prompt prefix "
        "(paged layout; prefills run only the unmatched suffix)",
    )
    bt.add_argument(
        "--prefill-chunk", type=int, default=None, metavar="N",
        help="chunked prefill: long prompts prefill N rows per scheduler "
        "step, interleaved with decode (paged layout; bounds inter-token "
        "latency under long-prompt admissions)",
    )

    # serve: HTTP front-end over the continuous-batching engine.
    sv = sub.add_parser("serve", help="Serve a checkpoint over HTTP")
    sv.add_argument("checkpoint")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--slots", type=int, default=8)
    sv.add_argument(
        "--sampling", choices=["host", "device"], default="device",
        help="host = reference-parity xorshift; device = chunked on-TPU sampling",
    )
    sv.add_argument("--kv", choices=["dense", "paged"], default="paged")
    sv.add_argument(
        "--kv-int8", action="store_true",
        help="INT8 page pool (per-row scales): halves KV HBM traffic and "
        "doubles pool capacity; paged layout only",
    )
    sv.add_argument("--page-size", type=int, default=128)
    sv.add_argument("--pages", type=int, default=None)
    sv.add_argument("--no-warmup", action="store_true")
    sv.add_argument(
        "--spec", type=int, default=0, metavar="K",
        help="n-gram speculative decoding: every slot verifies K drafts per "
        "round, distribution-exact at any temperature (paged + device "
        "sampling only; sync scheduling)",
    )
    sv.add_argument(
        "--spec-min-accept", type=float, default=1.35, metavar="T",
        help="acceptance-adaptive floor: fall back to plain decode chunks "
        "while the measured tokens/round EWMA sits below T (speculation "
        "re-probes periodically) — --spec never underperforms plain "
        "decoding on low-acceptance traffic",
    )
    sv.add_argument(
        "--prefix-cache", action="store_true",
        help="reuse KV pages across requests sharing a prompt prefix "
        "(paged layout; prefills run only the unmatched suffix)",
    )
    sv.add_argument(
        "--prefill-chunk", type=int, default=None, metavar="N",
        help="chunked prefill: long prompts prefill N rows per scheduler "
        "step, interleaved with decode (paged layout; bounds inter-token "
        "latency under long-prompt admissions)",
    )
    sv.add_argument(
        "--gateway", default=None, metavar="URL,URL",
        help="cross-host gateway mode: run NO local engine; route requests "
        "to these worker servers (each a normal `serve` process on its own "
        "host/chips) with least-loaded + prefix-affinity routing. The "
        "checkpoint argument supplies only the tokenizer/templates.",
    )
    sv.add_argument(
        "--tp", type=int, default=1,
        help="tensor-shard each replica's weights + KV over this many devices",
    )
    sv.add_argument(
        "--replicas", type=int, default=1,
        help="independent engine replicas over disjoint device sets "
        "(request-level data parallelism; requires replicas*tp <= n_devices)",
    )

    # eval-ppl: perplexity + int8-vs-f32 delta (the BASELINE accuracy bar).
    ev = sub.add_parser("eval-ppl", help="Evaluate perplexity of a checkpoint")
    ev.add_argument("checkpoint")
    ev.add_argument("-f", "--file", required=True, help="UTF-8 text file to evaluate")
    ev.add_argument(
        "--modes",
        default="fast,f32",
        help="comma-separated engine modes (fast, exact, f32); default fast,f32",
    )
    ev.add_argument("-w", "--window", type=int, default=None, help="evaluation window")
    return parser


def validate_export_dir(model_path: Path) -> None:
    """Pre-export validation (main.rs:102-131)."""
    if not model_path.is_dir():
        raise SystemExit(f"Model path is not a directory: {model_path}")
    required = ["config.json", "tokenizer.json"]
    missing = [f for f in required if not (model_path / f).exists()]
    if missing:
        raise SystemExit(f"Model directory {model_path} is missing: {', '.join(missing)}")
    if not list(model_path.glob("*.safetensors")):
        raise SystemExit(f"No .safetensors files found in {model_path}")


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="%(message)s", stream=sys.stderr
    )  # env_logger-equivalent bare formatting (main.rs:168-173)
    args = build_parser().parse_args(argv)

    if args.command != "export":
        # Model commands jit large programs; remote compiles here cost
        # minutes, so persist executables across invocations.
        from .utils import enable_compile_cache

        enable_compile_cache()

    if args.command == "export":
        from .export import export_model

        validate_export_dir(Path(args.model_path))
        export_model(
            args.model_path, args.output_path, args.group_size,
            fmt=args.format, weight_bits=args.bits,
        )
        return 0

    if args.command == "batch":
        import json
        import time

        if args.spec > 0 and args.kv != "paged":
            raise SystemExit(
                "--spec requires the paged KV layout: add --kv paged"
            )
        if args.prefix_cache and args.kv != "paged":
            raise SystemExit(
                "--prefix-cache requires the paged KV layout: add --kv paged"
            )
        if args.prefill_chunk is not None and args.kv != "paged":
            raise SystemExit(
                "--prefill-chunk requires the paged KV layout: add --kv paged"
            )

        from .checkpoint import load_checkpoint
        from .inference.tokenizer import Tokenizer
        from .serving import ContinuousBatchingEngine, Request

        config, weights = load_checkpoint(args.checkpoint)
        tokenizer = Tokenizer(args.checkpoint, config.vocab_size)
        engine = ContinuousBatchingEngine(
            config=config,
            weights=weights,
            n_slots=args.slots,
            sampling=args.sampling,
            seed=args.seed,
            kv_layout=args.kv,
            page_size=args.page_size,
            n_pages=args.pages,
            spec_k=args.spec,
            prefix_cache=args.prefix_cache,
            prefill_chunk=args.prefill_chunk,
        )
        if not args.no_warmup:
            engine.warmup()
        prompts = [l for l in Path(args.file).read_text().splitlines() if l.strip()]
        for i, prompt in enumerate(prompts):
            engine.submit(
                Request(
                    request_id=i,
                    prompt_tokens=tokenizer.encode(prompt),
                    max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature,
                    topp=args.topp,
                    seed=args.seed + i,
                    eos_token_ids=(tokenizer.bos_token_id, tokenizer.eos_token_id),
                )
            )
        t0 = time.perf_counter()
        done = engine.run()
        elapsed = time.perf_counter() - t0
        for req in sorted(done, key=lambda r: r.request_id):
            print(
                json.dumps(
                    {
                        "id": req.request_id,
                        "prompt": prompts[req.request_id],
                        "completion": tokenizer.decode(req.generated),
                        "tokens": len(req.generated),
                        "finish_reason": req.finish_reason,
                    }
                )
            )
        stats = engine.stats()
        total_tokens = sum(len(r.generated) for r in done)
        logging.info(
            "served %d requests, %d tokens in %.2fs (%.1f tok/s aggregate, "
            "slot utilization %.0f%%, p50 TTFT %s)",
            len(done),
            total_tokens,
            elapsed,
            total_tokens / elapsed if elapsed else 0.0,
            100 * stats["slot_utilization"],
            f"{stats['p50_ttft']*1e3:.0f}ms" if stats["p50_ttft"] else "n/a",
        )
        return 0

    if args.command == "serve":
        from .checkpoint import load_checkpoint
        from .inference.tokenizer import Tokenizer
        from .serving import ContinuousBatchingEngine
        from .serving.server import ServingFrontend, serve

        if args.gateway:
            # Cross-host gateway: tokenizer only, no weights / device work.
            from .configuration import read_config
            from .serving.remote import connect_workers

            config = read_config(args.checkpoint)
            tokenizer = Tokenizer(args.checkpoint, config.vocab_size)
            frontend = connect_workers(
                args.gateway.split(","), tokenizer, wait_s=600.0
            )
            serve(frontend, host=args.host, port=args.port)
            return 0

        config, weights = load_checkpoint(args.checkpoint)
        tokenizer = Tokenizer(args.checkpoint, config.vocab_size)
        engine_kwargs = {}
        if args.kv_int8:
            engine_kwargs["cache_dtype"] = "int8"

        import jax

        n_dev = len(jax.devices())
        if args.replicas * args.tp > n_dev:
            raise SystemExit(
                f"--replicas {args.replicas} x --tp {args.tp} needs "
                f"{args.replicas * args.tp} devices, have {n_dev}"
            )

        def make_engine(devices):
            mesh = None
            # A replica needs a mesh even at tp=1, to pin its arrays to its
            # own device instead of the process default.
            if args.tp > 1 or args.replicas > 1:
                from .parallel.mesh import create_mesh

                mesh = create_mesh(tp=args.tp, dp=1, devices=devices)
            return ContinuousBatchingEngine(
                config=config,
                weights=weights,
                n_slots=args.slots,
                sampling=args.sampling,
                kv_layout=args.kv,
                page_size=args.page_size,
                n_pages=args.pages,
                mesh=mesh,
                spec_k=args.spec,
                spec_min_accept=args.spec_min_accept,
                prefix_cache=args.prefix_cache,
                prefill_chunk=args.prefill_chunk,
                **engine_kwargs,
            )

        engines = [
            make_engine(jax.devices()[i * args.tp : (i + 1) * args.tp])
            for i in range(args.replicas)
        ]
        if not args.no_warmup:
            logging.info("warming up (compiling serving step functions)...")
            for eng in engines:
                eng.warmup()
        frontends = [ServingFrontend(eng, tokenizer) for eng in engines]
        if len(frontends) == 1:
            frontend = frontends[0]
        else:
            from .serving.server import ReplicatedFrontend

            frontend = ReplicatedFrontend(frontends)
        serve(frontend, host=args.host, port=args.port)
        return 0

    if args.command == "eval-ppl":
        import json

        from .evaluation import evaluate_checkpoint

        text = Path(args.file).read_text()
        results = evaluate_checkpoint(
            args.checkpoint,
            text=text,
            modes=tuple(args.modes.split(",")),
            window=args.window,
        )
        payload = {
            mode: {"perplexity": r.perplexity, "avg_nll": r.avg_nll, "tokens": r.n_tokens}
            for mode, r in results.items()
        }
        if "f32" in results:
            for mode, r in results.items():
                if mode != "f32":
                    payload[mode]["ppl_delta_vs_f32"] = r.delta_vs(results["f32"])
        print(json.dumps(payload, indent=2))
        return 0

    if args.command == "inference":
        from . import InferenceConfig, run_inference

        config = InferenceConfig(
            checkpoint_path=args.checkpoint,
            temperature=args.temperature,
            topp=args.topp,
            ctx_length=args.context,
            mode=args.mode,
            prompt=args.input,
            system_prompt=args.system,
            enable_thinking=args.reasoning == 1,
            seed=args.seed,
            engine_mode=args.engine_mode,
            device_sampling=args.device_sampling,
            kv_int8=args.kv_int8,
            speculative=args.spec,
            sp=args.sp,
            sp_threshold=args.sp_threshold,
        )
        run_inference(config)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
