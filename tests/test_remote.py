"""Cross-host serving: gateway → remote workers over the HTTP hop.

Two worker servers (each its own engine + page pool, sharing nothing) and a
gateway routing through ``RemoteWorkerClient``s — the BASELINE config-5
deployment shape, exercised end-to-end over real sockets (in-process
servers; each worker's engine is identical to a per-host one)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from test_model_parity import make_weights
from test_server import FakeTokenizer
from utils import TINY_CONFIG

from qwen3_rs_tpu.serving import ContinuousBatchingEngine, Request
from qwen3_rs_tpu.serving.remote import RemoteWorkerClient, connect_workers
from qwen3_rs_tpu.serving.server import (
    ReplicatedFrontend,
    ServingFrontend,
    make_handler,
)


def _make_worker(weights, prefix_cache=False):
    engine = ContinuousBatchingEngine(
        config=TINY_CONFIG, weights=weights, n_slots=2, mode="fast",
        prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
        prefix_cache=prefix_cache,
    )
    fe = ServingFrontend(engine, FakeTokenizer())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(fe))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return fe, httpd


@pytest.fixture(scope="module")
def workers():
    rng = np.random.default_rng(5)
    _, weights = make_weights(TINY_CONFIG, rng)
    made = [_make_worker(weights) for _ in range(2)]
    yield [
        f"http://127.0.0.1:{httpd.server_address[1]}" for _, httpd in made
    ], weights
    for fe, httpd in made:
        httpd.shutdown()
        fe.shutdown()


def _reference_outputs(weights, prompts, **kw):
    engine = ContinuousBatchingEngine(
        config=TINY_CONFIG, weights=weights, n_slots=2, mode="fast",
        prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
    )
    tok = FakeTokenizer()
    out = {}
    for i, p in enumerate(prompts):
        engine.submit(
            Request(
                request_id=i,
                prompt_tokens=tok.encode(p),
                max_new_tokens=kw.get("max_tokens", 6),
                temperature=kw.get("temperature", 0.0),
                topp=kw.get("top_p", 0.9),
                seed=kw.get("seed", 0),
                eos_token_ids=(tok.bos_token_id, tok.eos_token_id),
            )
        )
    for r in engine.run():
        out[r.request_id] = r.generated
    return [out[i] for i in range(len(prompts))]


def test_gateway_routes_and_matches(workers):
    urls, weights = workers
    gw = connect_workers(urls, FakeTokenizer(), wait_s=30.0)
    prompts = [f"prompt number {i}" for i in range(6)]
    pendings = [gw.submit(p, max_tokens=6, seed=0) for p in prompts]
    for p in pendings:
        assert p.done.wait(timeout=300)
    got = [p.request.generated for p in pendings]
    want = _reference_outputs(weights, prompts)
    assert got == want
    # Both workers actually served traffic (least-loaded spread).
    served = [c.stats().get("completed", 0) for c in gw.frontends]
    assert all(s > 0 for s in served), served
    assert sum(served) >= len(prompts)


def test_gateway_streaming(workers):
    urls, _ = workers
    client = RemoteWorkerClient(urls[0], FakeTokenizer())
    pending = client.submit("stream me", max_tokens=5, stream=True)
    toks = []
    while True:
        t = pending.tokens.get(timeout=300)
        if t is None:
            break
        toks.append(t)
    assert pending.done.wait(timeout=30)
    assert toks == pending.request.generated
    assert len(toks) >= 1
    assert pending.request.finish_reason in ("length", "eos")


def test_gateway_http_stack(workers):
    """Full stack: HTTP client → gateway server → remote worker → engine."""
    urls, weights = workers
    gw = connect_workers(urls, FakeTokenizer())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(gw))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "hello", "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.load(r)
        assert body["tokens"] >= 1
        assert "text" in body
        want = _reference_outputs(weights, ["hello"], max_tokens=4)[0]
        assert body["tokens"] == len(want)
        # Aggregated stats across remote workers.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30
        ) as r:
            stats = json.load(r)
        assert stats["replicas"] == 2
    finally:
        httpd.shutdown()


def test_unhealthy_worker_raises():
    with pytest.raises(TimeoutError):
        connect_workers(
            ["http://127.0.0.1:9"], FakeTokenizer(), wait_s=0.5
        )
