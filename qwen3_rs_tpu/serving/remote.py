"""Cross-host serving: request-level data parallelism over worker processes.

BASELINE config 5 ("continuous batching across N≥2 hosts, sharded KV") as a
real deployment shape (the reference has no serving or distributed layer at
all — SURVEY §2.4):

* each **worker host** runs one ordinary serving process (`cli.py serve`) —
  its own engine, tp mesh over its local chips, page pool, prefix cache;
* a **gateway** process routes requests to workers over a thin HTTP hop
  (`RemoteWorkerClient` speaks the same /v1 protocol the workers expose)
  through the same ``ReplicatedFrontend`` used for single-host replicas —
  least-loaded routing + prefix affinity apply across hosts unchanged.

Workers share nothing, so scaling efficiency across hosts is limited only
by the gateway fan-out; KV stays sharded per host (pool sharded over each
worker's tp mesh).  Model-parallel multi-host serving (one model spanning
hosts over DCN) instead uses ``parallel.distributed.initialize_distributed``
+ the shard_map tp forward — see docs/serving.md runbook.

The client always streams from the worker so generated token ids are
available to the gateway exactly as with a local engine (the non-stream
completion body only carries text).
"""

from __future__ import annotations

import json
import logging
import threading
import urllib.request
from typing import Optional

from .server import ReplicatedFrontend, _Pending

logger = logging.getLogger(__name__)


class _RemoteResult:
    """Request-shaped completion record reconstructed from the stream."""

    def __init__(self, request_id: int):
        self.request_id = request_id
        self.generated: list[int] = []
        self.finish_reason: Optional[str] = None
        self.ttft: Optional[float] = None


class RemoteWorkerClient:
    """``ServingFrontend``-shaped handle for a remote worker process.

    submit()/stats()/load/shutdown match what ``ReplicatedFrontend`` and
    ``make_handler`` consume, so a gateway process can mix local engines
    and remote workers behind one router.
    """

    def __init__(
        self,
        base_url: str,
        tokenizer,
        timeout_s: float = 600.0,
        prefix_cache: bool = True,
    ):
        self.base_url = base_url.rstrip("/")
        self.tokenizer = tokenizer
        self.timeout_s = timeout_s
        self._inflight = 0
        self._lock = threading.Lock()
        self._next_id = 0
        # ReplicatedFrontend probes `.engine.prefix_cache` to decide whether
        # prefix-affinity routing pays; workers default to caching prefixes,
        # and over-affinity is bounded by the router's slack anyway.
        import types

        self.engine = types.SimpleNamespace(prefix_cache=prefix_cache)

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
        with self._lock:
            req_id = self._next_id
            self._next_id += 1
            self._inflight += 1
        pending = _Pending(stream)
        pending.request = _RemoteResult(req_id)

        payload = json.dumps(
            {
                "prompt": prompt,
                "max_tokens": max_tokens,
                "temperature": temperature,
                "top_p": top_p,
                "seed": seed,
                "stream": True,  # always stream: the gateway needs token ids
            }
        ).encode()

        def run():
            try:
                req = urllib.request.Request(
                    self.base_url + "/v1/completions",
                    data=payload,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    for raw in resp:
                        line = raw.strip()
                        if not line:
                            continue
                        obj = json.loads(line)
                        if obj.get("done"):
                            pending.request.finish_reason = obj.get("finish_reason")
                            break
                        tok = int(obj["token"])
                        pending.request.generated.append(tok)
                        if stream:
                            pending.tokens.put(tok)
            except Exception as e:  # noqa: BLE001 — surfaced via finish_reason
                logger.error("remote worker %s failed: %s", self.base_url, e)
                pending.request.finish_reason = f"error: {e}"
            finally:
                if stream:
                    pending.tokens.put(None)
                with self._lock:
                    self._inflight -= 1
                pending.done.set()

        threading.Thread(target=run, daemon=True).start()
        return pending

    @property
    def load(self) -> int:
        with self._lock:
            return self._inflight

    def stats(self) -> dict:
        try:
            with urllib.request.urlopen(
                self.base_url + "/v1/stats", timeout=30
            ) as resp:
                return json.loads(resp.read())
        except Exception as e:  # noqa: BLE001
            return {"error": str(e), "worker": self.base_url}

    def healthy(self, timeout_s: float = 5.0) -> bool:
        try:
            with urllib.request.urlopen(
                self.base_url + "/health", timeout=timeout_s
            ) as resp:
                return json.loads(resp.read()).get("status") == "ok"
        except Exception:  # noqa: BLE001
            return False

    def shutdown(self):  # worker lifetime is owned by its own process
        pass


def connect_workers(
    urls: list[str], tokenizer, *, wait_s: float = 0.0
) -> ReplicatedFrontend:
    """Gateway entry: a ``ReplicatedFrontend`` routing over remote workers.

    ``wait_s`` > 0 polls each worker's /health until ready (workers compile
    their first buckets at startup)."""
    import time

    clients = [RemoteWorkerClient(u, tokenizer) for u in urls]
    if wait_s:
        deadline = time.monotonic() + wait_s
        for c in clients:
            while not c.healthy():
                if time.monotonic() > deadline:
                    raise TimeoutError(f"worker {c.base_url} not healthy")
                time.sleep(0.25)
    return ReplicatedFrontend(clients)
