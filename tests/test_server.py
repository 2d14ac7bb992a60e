"""HTTP serving front-end tests (in-process server, tiny model)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.serving import ContinuousBatchingEngine, Request
from qwen3_rs_tpu.serving.server import ServingFrontend, make_handler


class FakeTokenizer:
    """Token-id passthrough: 'a b c' ↔ [ord offsets]; enough for plumbing."""

    bos_token_id = 1
    eos_token_id = 2
    prompt_template = "<u>%s</u><a>"
    system_prompt_template = "<sys>%s</sys><a>"

    def encode(self, text):
        return [3 + (ord(c) % 90) for c in text][:8] or [3]

    def decode(self, tokens):
        return " ".join(str(t) for t in tokens)

    def decode_bytes(self, token):
        return f"{token} ".encode()


@pytest.fixture(scope="module")
def frontend():
    rng = np.random.default_rng(5)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)
    engine = ContinuousBatchingEngine(
        config=config, weights=weights, n_slots=2, mode="fast",
        prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
    )
    fe = ServingFrontend(engine, FakeTokenizer())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(fe))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield fe, httpd.server_address[1]
    httpd.shutdown()
    fe.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_health_and_stats(frontend):
    _, port = frontend
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
        assert json.load(r)["status"] == "ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/stats", timeout=30) as r:
        stats = json.load(r)
    assert "slot_utilization" in stats and "kv_pages_total" in stats


def test_completion_roundtrip(frontend):
    _, port = frontend
    with _post(port, {"prompt": "hello", "max_tokens": 5}) as r:
        out = json.load(r)
    assert out["tokens"] == 5 or out["finish_reason"] == "stop"
    assert isinstance(out["text"], str)
    assert out["ttft_s"] is None or out["ttft_s"] > 0


def test_concurrent_completions_deterministic(frontend):
    """Two identical greedy requests issued concurrently must agree."""
    _, port = frontend
    results = [None, None]

    def go(i):
        with _post(port, {"prompt": "same prompt", "max_tokens": 6}) as r:
            results[i] = json.load(r)["text"]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert results[0] is not None and results[0] == results[1]


def test_streaming(frontend):
    _, port = frontend
    with _post(port, {"prompt": "stream me", "max_tokens": 4, "stream": True}) as r:
        lines = [json.loads(l) for l in r.read().decode().strip().splitlines()]
    assert lines[-1]["done"] is True
    token_chunks = [l for l in lines[:-1] if "token" in l]
    assert 1 <= len(token_chunks) <= 4


def test_bad_request(frontend):
    _, port = frontend
    try:
        _post(port, {"nope": 1})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def _post_chat(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_chat_completion_matches_rendered_prompt(frontend):
    """/v1/chat/completions == /v1/completions on the template-rendered
    prompt (greedy)."""
    fe, port = frontend
    messages = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ]
    from qwen3_rs_tpu.serving.server import render_chat

    rendered = render_chat(messages, fe.tokenizer)
    assert rendered == "<sys>be brief\nhi</sys><a>"
    with _post_chat(port, {"messages": messages, "max_tokens": 5}) as r:
        chat_out = json.load(r)
    with _post(port, {"prompt": rendered, "max_tokens": 5}) as r:
        plain_out = json.load(r)
    assert chat_out["message"]["role"] == "assistant"
    assert chat_out["message"]["content"] == plain_out["text"]


def test_chat_multi_turn_rendering():
    from qwen3_rs_tpu.serving.server import render_chat

    tok = FakeTokenizer()
    msgs = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    # First user turn has no system → plain template; later turns plain;
    # assistant content verbatim (its EOS never entered the live KV cache).
    assert render_chat(msgs, tok) == "<u>q1</u><a>a1<u>q2</u><a>"
    import pytest

    with pytest.raises(ValueError, match="user turn"):
        render_chat([{"role": "system", "content": "s"}], tok)
    with pytest.raises(ValueError, match="unknown role"):
        render_chat([{"role": "tool", "content": "x"}], tok)


import urllib.error  # noqa: E402  (used in test_bad_request)


@pytest.fixture(scope="module")
def replicated():
    """Two independent engine replicas behind the dp router."""
    from qwen3_rs_tpu.serving.server import ReplicatedFrontend

    rng = np.random.default_rng(5)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)

    def make_engine():
        return ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
        )

    fes = [ServingFrontend(make_engine(), FakeTokenizer()) for _ in range(2)]
    rf = ReplicatedFrontend(fes)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(rf))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield rf, httpd.server_address[1]
    httpd.shutdown()
    rf.shutdown()


def test_replicated_routing_and_parity(replicated, frontend):
    """Concurrent identical greedy requests through the dp router must all
    agree with the single-engine answer, and the router must aggregate
    stats across replicas."""
    rf, port = replicated
    _, single_port = frontend

    with _post(single_port, {"prompt": "same prompt", "max_tokens": 6}) as r:
        expected = json.load(r)["text"]

    n = 4
    results = [None] * n

    def go(i):
        with _post(port, {"prompt": "same prompt", "max_tokens": 6}) as r:
            results[i] = json.load(r)["text"]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(n)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert all(r == expected for r in results), results

    stats = rf.stats()
    assert stats["replicas"] == 2
    assert stats["completed"] == sum(
        s["completed"] for s in stats["per_replica"]
    )
    assert len(stats["load"]) == 2


def test_replicated_least_loaded_routing():
    """The router must pick the replica with the fewest outstanding
    requests (no engine needed: stub frontends)."""
    from qwen3_rs_tpu.serving.server import ReplicatedFrontend

    class Stub:
        def __init__(self, load):
            self.load = load
            self.tokenizer = FakeTokenizer()
            self.calls = 0

        def submit(self, prompt, **kw):
            self.calls += 1
            self.load += 1
            return object()

    a, b = Stub(3), Stub(1)
    rf = ReplicatedFrontend([a, b])
    rf.submit("x")  # → b (load 1 < 3)
    rf.submit("x")  # → b (load 2 < 3)
    rf.submit("x")  # → b (load 3 == 3, min picks first-lowest: a)
    assert b.calls == 2 and a.calls == 1


def test_replicated_prefix_affinity_routing():
    """With prefix caching on, same-head prompts stick to one replica
    (whose page pool holds the prefix) unless it falls too far behind."""
    from qwen3_rs_tpu.serving.server import ReplicatedFrontend

    class Eng:
        prefix_cache = True

    class Stub:
        def __init__(self, load):
            self.load = load
            self.engine = Eng()
            self.tokenizer = FakeTokenizer()
            self.calls = 0

        def submit(self, prompt, **kw):
            self.calls += 1
            self.load += 1
            return object()

    a, b = Stub(0), Stub(0)
    rf = ReplicatedFrontend([a, b], affinity_slack=2)
    sys_prompt = "You are a helpful assistant. " * 10  # > AFFINITY_CHARS
    rf.submit(sys_prompt + "q1")  # ties break to a; a becomes sticky
    rf.submit(sys_prompt + "q2")  # sticky a despite b now less loaded
    rf.submit(sys_prompt + "q3")  # a at +2 = slack: still sticky
    assert a.calls == 3 and b.calls == 0
    rf.submit(sys_prompt + "q4")  # a at +3 > slack → rebalance to b
    assert b.calls == 1
    # b becomes the new sticky replica for this prefix.
    rf.submit(sys_prompt + "q5")
    assert b.calls == 2
    # A different prefix routes purely by load (b at 2 < a at 3).
    rf.submit("unrelated prompt " * 8)
    assert b.calls == 3 and a.calls == 3
    # Without prefix caching, no affinity map exists.
    class PlainEng:
        prefix_cache = False

    c = Stub(0)
    c.engine = PlainEng()
    rf2 = ReplicatedFrontend([c])
    assert rf2._affinity is None
