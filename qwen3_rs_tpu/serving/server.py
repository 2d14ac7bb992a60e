"""Minimal HTTP serving front-end over the continuous-batching engine.

The reference is an interactive CLI only (SURVEY §2.4: no serving layer);
the TPU framework's serving target is continuous batching of concurrent
requests, so this module exposes it as a small dependency-free HTTP server
(stdlib ``http.server``):

* ``POST /v1/completions`` — ``{"prompt": str, "max_tokens": int,
  "temperature": float, "top_p": float, "seed": int}`` → one JSON object
  with the completion (or, with ``"stream": true``, newline-delimited JSON
  chunks as tokens are emitted);
* ``POST /v1/chat/completions`` — ``{"messages": [{"role": "system"|
  "user"|"assistant", "content": str}, ...], ...}`` → the conversation is
  rendered through the checkpoint's ``%s`` prompt templates with the exact
  semantics of the interactive chat loop (generation.rs:188-195: the
  system template only on the first user turn; assistant turns appended
  verbatim — their EOS never entered the reference's KV cache either);
  response carries ``{"message": {"role": "assistant", "content": ...}}``;
* ``GET /v1/stats`` — scheduler counters (slot utilization, p50 TTFT,
  page-pool usage);
* ``GET /health``.

One worker thread owns the engine (it is not thread-safe); HTTP handler
threads communicate with it through queues.  This is deliberately a thin
host-side shim: all batching/scheduling lives in scheduler.py and all
device work is the same jitted step functions the batch CLI uses.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .scheduler import ContinuousBatchingEngine, Request

logger = logging.getLogger(__name__)


class _Pending:
    def __init__(self, stream: bool):
        self.stream = stream
        self.tokens: "queue.Queue[Optional[int]]" = queue.Queue()
        self.done = threading.Event()
        self.request: Optional[Request] = None


def render_chat(messages: list[dict], tokenizer) -> str:
    """Render an OpenAI-style message list through the checkpoint's ``%s``
    templates with interactive-chat parity (inference/generation.py
    ``render_prompt``): the first user turn carries the system prompt (if
    any), later user turns use the plain template, and assistant turns are
    appended verbatim — in the live chat loop the assistant's EOS token is
    detected and never forwarded, so the stateless context omits it too."""
    from ..inference.generation import render_prompt

    system: Optional[str] = None
    parts: list[str] = []
    first_user = True
    for m in messages:
        role, content = m["role"], m["content"]
        if role == "system":
            system = content
        elif role == "user":
            parts.append(
                render_prompt(0 if first_user else 1,
                              system if first_user else None,
                              content, tokenizer)
            )
            first_user = False
        elif role == "assistant":
            parts.append(content)
        else:
            raise ValueError(f"unknown role: {role!r}")
    if first_user:
        raise ValueError("messages must contain at least one user turn")
    return "".join(parts)


class ServingFrontend:
    """Owns the engine worker thread and request plumbing."""

    def __init__(self, engine: ContinuousBatchingEngine, tokenizer, poll_idle_s=0.005):
        self.engine = engine
        self.tokenizer = tokenizer
        self._submissions: "queue.Queue[tuple[Request, _Pending]]" = queue.Queue()
        self._pending: dict[int, _Pending] = {}
        self._next_id = 0
        self._id_lock = threading.Lock()
        self._poll_idle_s = poll_idle_s
        self._running = True
        self._completed_seen = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client api
    def submit(
        self,
        prompt: str,
        *,
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        seed: int = 0,
        stream: bool = False,
    ) -> _Pending:
        with self._id_lock:
            req_id = self._next_id
            self._next_id += 1
        req = Request(
            request_id=req_id,
            prompt_tokens=self.tokenizer.encode(prompt),
            max_new_tokens=max_tokens,
            temperature=temperature,
            topp=top_p,
            seed=seed,
            eos_token_ids=(self.tokenizer.bos_token_id, self.tokenizer.eos_token_id),
        )
        pending = _Pending(stream)
        self._submissions.put((req, pending))
        return pending

    def stats(self) -> dict:
        return self.engine.stats()

    @property
    def load(self) -> int:
        """Requests submitted but not yet completed (queued + in flight)."""
        return self._submissions.qsize() + len(self._pending)

    def shutdown(self):
        self._running = False
        self._thread.join(timeout=10)

    # ---------------------------------------------------------------- worker
    def _worker(self):
        while self._running:
            admitted = False
            while True:
                try:
                    req, pending = self._submissions.get_nowait()
                except queue.Empty:
                    break
                self._pending[req.request_id] = pending
                pending.request = req
                self.engine.submit(req)
                admitted = True

            if self.engine.has_work:
                emitted = self.engine.step()
                for req, token in emitted:
                    p = self._pending.get(req.request_id)
                    if p is not None and p.stream:
                        p.tokens.put(token)
                # Completion notifications.
                done = self.engine.completed
                while self._completed_seen < len(done):
                    req = done[self._completed_seen]
                    self._completed_seen += 1
                    p = self._pending.pop(req.request_id, None)
                    if p is not None:
                        p.request = req
                        if p.stream:
                            p.tokens.put(None)  # sentinel
                        p.done.set()
            elif not admitted:
                time.sleep(self._poll_idle_s)


class ReplicatedFrontend:
    """Request-level data parallelism: route each request to the
    least-loaded of N engine replicas.

    The engine rejects dp>1 meshes by design (scheduler.py: request-level
    parallelism runs one engine per dp replica) — this router IS that dp
    layer.  Deployment shapes:

    * single host, multiple chips: R replicas × tp-submeshes over disjoint
      device sets (``serve --replicas R --tp K``) — each replica has its
      own weights copy, page pool, and scheduler, so there is no
      cross-replica synchronization anywhere on the hot path;
    * multi-host pod: one process per host running its own engine, with an
      external load balancer (or this class in a gateway process) routing
      requests — the ≥85% scaling-efficiency target (BASELINE config 5)
      holds by construction because replicas share nothing.

    Exposes the same surface ``make_handler`` needs (submit / stats /
    tokenizer / shutdown), so the HTTP layer is replica-agnostic.
    """

    #: characters of the prompt head that define a routing-affinity key.
    #: Must sit INSIDE the shared prefix to co-locate its requests, so err
    #: short: over-merging only co-locates more (bounded by the slack);
    #: under-merging silently loses every cross-request hit.  256 chars ≈
    #: half a default 128-token page.
    AFFINITY_CHARS = 256

    def __init__(
        self, frontends: list[ServingFrontend], affinity_slack: int = 4
    ):
        if not frontends:
            raise ValueError("need at least one replica")
        self.frontends = frontends
        self.tokenizer = frontends[0].tokenizer
        self._lock = threading.Lock()
        # Routed-but-not-yet-enqueued counts: submit() tokenizes the prompt
        # outside the lock (it can take ms on long prompts), so the lock
        # only covers replica choice — these reservations keep concurrent
        # submits from all piling onto the same "least-loaded" replica.
        self._reserved = [0] * len(frontends)
        # Prefix affinity: each replica's page pools are private, so a
        # shared-prefix request only hits the prefix cache on the replica
        # that computed the prefix.  When the engines cache prefixes,
        # same-head prompts route to a sticky replica unless it is more
        # than ``affinity_slack`` requests busier than the least-loaded
        # one (bounded imbalance beats recomputing the prefill).
        self._affinity_slack = affinity_slack
        from collections import OrderedDict

        self._affinity: "OrderedDict[int, int] | None" = (
            OrderedDict()
            if any(
                getattr(getattr(f, "engine", None), "prefix_cache", False)
                for f in frontends
            )
            else None
        )
        self._affinity_cap = 4096  # LRU-bounded: long-lived servers

    def _route(self, prompt: str) -> int:
        loads = [
            self.frontends[j].load + self._reserved[j]
            for j in range(len(self.frontends))
        ]
        best = min(range(len(loads)), key=loads.__getitem__)
        if self._affinity is None:
            return best
        key = hash(prompt[: self.AFFINITY_CHARS])
        sticky = self._affinity.get(key)
        if sticky is not None and loads[sticky] - loads[best] <= self._affinity_slack:
            self._affinity.move_to_end(key)
            return sticky
        self._affinity[key] = best
        self._affinity.move_to_end(key)
        while len(self._affinity) > self._affinity_cap:
            self._affinity.popitem(last=False)
        return best

    def submit(self, prompt: str, **kwargs) -> _Pending:
        with self._lock:
            i = self._route(prompt)
            self._reserved[i] += 1
        try:
            return self.frontends[i].submit(prompt, **kwargs)
        finally:
            with self._lock:
                self._reserved[i] -= 1

    def stats(self) -> dict:
        per = [f.stats() for f in self.frontends]
        agg = {
            "replicas": len(per),
            "per_replica": per,
            "load": [f.load for f in self.frontends],
        }
        # Aggregate the counters that sum; utilization averages.
        for key in ("completed", "kv_pages_total", "kv_pages_free"):
            if all(key in s for s in per):
                agg[key] = sum(s[key] for s in per)
        if all("slot_utilization" in s for s in per):
            agg["slot_utilization"] = sum(
                s["slot_utilization"] for s in per
            ) / len(per)
        ttfts = [s["p50_ttft"] for s in per if s.get("p50_ttft")]
        agg["p50_ttft"] = sorted(ttfts)[len(ttfts) // 2] if ttfts else None
        return agg

    def shutdown(self):
        for f in self.frontends:
            f.shutdown()


def make_handler(frontend: ServingFrontend):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging
            logger.debug("http: " + fmt, *args)

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/v1/stats":
                self._json(200, frontend.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            chat = self.path == "/v1/chat/completions"
            if self.path != "/v1/completions" and not chat:
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if chat:
                    prompt = render_chat(payload["messages"], frontend.tokenizer)
                else:
                    prompt = payload["prompt"]
            except (json.JSONDecodeError, KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return

            pending = frontend.submit(
                prompt,
                max_tokens=int(payload.get("max_tokens", 128)),
                temperature=float(payload.get("temperature", 0.0)),
                top_p=float(payload.get("top_p", 0.9)),
                seed=int(payload.get("seed", 0)),
                stream=bool(payload.get("stream", False)),
            )
            if pending.stream:
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                from ..inference.tokenizer import Utf8StreamDecoder

                decoder = Utf8StreamDecoder()
                while True:
                    token = pending.tokens.get()
                    if token is None:
                        break
                    piece = decoder.push(frontend.tokenizer.decode_bytes(token))
                    chunk = json.dumps({"token": token, "text": piece}).encode() + b"\n"
                    self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                req = pending.request
                tail = json.dumps(
                    {"done": True, "finish_reason": req.finish_reason,
                     "tokens": len(req.generated)}
                ).encode() + b"\n"
                self.wfile.write(f"{len(tail):x}\r\n".encode() + tail + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            else:
                pending.done.wait()
                req = pending.request
                text = frontend.tokenizer.decode(req.generated)
                body = {
                    "tokens": len(req.generated),
                    "finish_reason": req.finish_reason,
                    "ttft_s": req.ttft,
                }
                if chat:
                    body["message"] = {"role": "assistant", "content": text}
                else:
                    body["text"] = text
                self._json(200, body)

    return Handler


def serve(frontend: ServingFrontend, host: str = "127.0.0.1", port: int = 8000):
    """Blocking server loop."""
    httpd = ThreadingHTTPServer((host, port), make_handler(frontend))
    logger.info("serving on http://%s:%d", host, port)
    try:
        httpd.serve_forever()
    finally:
        frontend.shutdown()
