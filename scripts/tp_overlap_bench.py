"""A/B the tensor-parallel collective-matmul overlap.

Times the shard_map tp prefill step with the row-parallel projections
unchunked (one psum per projection, QWEN3_TPU_TP_OVERLAP_CHUNKS=1) vs
chunked (psum per column chunk, issued while the next chunk's matmul
runs).  On a real multi-chip TPU slice the chunked variant hides the
matmul FLOPs under the all-reduce stream; on the CPU mesh this script
still validates parity and measures the (meaningless for ICI) host
timing, so it can run anywhere.

Usage:  python scripts/tp_overlap_bench.py [--tp N] [--rows R] [--model 8b]
Writes one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--model", default="0.6b")
    ap.add_argument("--chunks", default="1,4")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from qwen3_rs_tpu.models.qwen3 import init_kv_cache
    from qwen3_rs_tpu.parallel.mesh import TP_AXIS
    from qwen3_rs_tpu.parallel.tp import (
        make_tp_forward,
        shard_cache_tp,
        shard_weights_tp,
    )
    from qwen3_rs_tpu.testing import qwen3_config, random_weights

    tp = args.tp or len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()[:tp]), (TP_AXIS,))
    config = qwen3_config(args.model, seq_len=max(2 * args.rows, 2048))
    weights = random_weights(config)

    w_tp = shard_weights_tp(weights, mesh, config)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, config.vocab_size, (1, args.rows)),
        jnp.int32,
    )
    pos = jnp.zeros(1, jnp.int32)

    results = {}
    for chunks in (int(c) for c in args.chunks.split(",")):
        os.environ["QWEN3_TPU_TP_OVERLAP_CHUNKS"] = str(chunks)
        os.environ["QWEN3_TPU_TP_OVERLAP_MIN_ROWS"] = "512"
        fwd = make_tp_forward(config, mesh)
        cache = shard_cache_tp(init_kv_cache(config, batch=1, dtype=jnp.bfloat16), mesh)
        logits, cache = fwd(w_tp, tokens, cache, pos)  # compile + warm
        logits.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            logits, cache = fwd(w_tp, tokens, cache, pos)
        logits.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        results[chunks] = (dt, np.asarray(logits))
        print(
            json.dumps(
                {
                    "metric": f"tp{tp}_prefill_{args.rows}r_chunks{chunks}",
                    "value": round(dt * 1e3, 3),
                    "unit": "ms/step",
                    "backend": jax.default_backend(),
                }
            ),
            flush=True,
        )

    keys = sorted(results)
    if len(keys) > 1:
        a, b = results[keys[0]][1], results[keys[-1]][1]
        err = float(np.max(np.abs(a - b)))
        print(json.dumps({"metric": "overlap_parity_max_abs_diff", "value": err}))


if __name__ == "__main__":
    main()
