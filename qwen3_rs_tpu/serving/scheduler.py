"""Continuous batching scheduler over fixed decode slots.

The reference serves exactly one interactive request at a time
(SURVEY §2.4: no batching, no serving layer).  The TPU-native engine decodes
a fixed-width batch of request *slots* every step and refills slots as
requests finish — request-level continuous batching:

* decode: one jitted step over all ``n_slots`` (per-slot positions; finished/
  empty slots are masked out of cache writes and their logits ignored);
* prefill (dense layout): a new request runs through a batch-1 scratch cache
  (bucketed prompt length) and its K/V window is inserted into the shared
  cache at its slot with one small dynamic-slice copy — no full-batch
  recompute;
* prefill (paged layout): queued requests sharing a prompt bucket admit as a
  **group** — one batched prefill writes every request's K/V straight into
  its own pages.  A b=1 prefill is weight-stream-bound (the whole INT8 model
  streams from HBM for ~100 rows of compute), so admitting k requests
  separately pays that stream k times plus k logits round-trips; the group
  pays once.  The batch axis pads to a power of two to bound compiled
  shapes;
* sampling: per-request host samplers (reference-parity xorshift streams,
  per-request seeds) or a shared on-device sampler;
* pipelining (device sampling): decode chunk N+1 dispatches BEFORE chunk
  N's tokens are fetched — continuing slots chain their input token
  device-side and admissions scatter their device-sampled first tokens
  into the next chunk's input, so in steady state the device never waits
  for a host round-trip.  Requests that finish mid-chunk keep decoding as
  zombies in the already-dispatched chunk (tokens discarded at
  processing; cache writes touch only dead rows / the null page; page
  reuse is ordered by device dispatch order).  See docs/serving.md.

Scheduling is FCFS admission; each scheduler ``step()`` first drains the
queue into every free slot (bounded by ``max_admissions_per_step``), then
advances every active slot by one decode chunk.  Draining minimizes TTFT
under bursty arrivals; the tradeoff is that each blocking prefill delays
in-flight streams' next token, so latency-sensitive deployments can cap
admissions per step to bound that inter-token stall.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import logging
import os
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_checkpoint
from ..configuration import ModelConfig
from ..models.qwen3 import KVCache, Qwen3Weights, init_kv_cache, qwen3_forward
from ..ops.sampling import Sampler

logger = logging.getLogger(__name__)


class RequestState(enum.Enum):
    QUEUED = "queued"
    ACTIVE = "active"
    DONE = "done"


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_tokens: list[int]
    max_new_tokens: int = 256
    temperature: float = 0.0
    topp: float = 0.9
    seed: int = 0
    eos_token_ids: tuple[int, ...] = ()
    # Filled by the scheduler:
    generated: list[int] = dataclasses.field(default_factory=list)
    state: RequestState = RequestState.QUEUED
    slot: Optional[int] = None
    submit_time: float = 0.0
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    finish_reason: Optional[str] = None
    _sampler: Optional[Sampler] = None
    _next_pos: int = 0

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.submit_time


class ContinuousBatchingEngine:
    """Slot-based continuous batching over one shared KV cache."""

    #: Processed spec chunks before the acceptance-adaptive policy may
    #: disable speculation (cold-history grace — see __init__).
    _SPEC_GRACE_CHUNKS = 3

    def __init__(
        self,
        checkpoint: str | Path | None = None,
        *,
        config: ModelConfig | None = None,
        weights: Qwen3Weights | None = None,
        n_slots: int = 8,
        mode: str = "fast",
        cache_dtype=jnp.bfloat16,
        prefill_buckets: tuple[int, ...] = (32, 128, 512, 2048),
        sampling: str = "host",
        decode_chunk_steps: int = 8,
        seed: int = 0,
        kv_layout: str = "dense",
        page_size: int = 128,
        n_pages: int | None = None,
        max_admissions_per_step: int | None = None,
        mesh=None,
        spec_k: int = 0,
        spec_min_accept: float = 1.35,
        spec_probe_chunks: int = 16,
        prefix_cache: bool = False,
        prefill_chunk: int | None = None,
    ):
        if checkpoint is not None:
            config, weights = load_checkpoint(checkpoint)
        assert config is not None and weights is not None
        self.config = config.validate()
        if mode == "fast":
            from ..models.qwen3 import cast_weight_scales

            weights = cast_weight_scales(weights)
        # Tensor-parallel serving: weights + KV shard over the mesh's tp
        # axis and every step function runs the forward INSIDE shard_map
        # (parallel/tp.py) — each shard sees local arrays with ordinary
        # shapes, so the Pallas paged/flash kernels engage per shard and
        # the collectives are the explicit Megatron psums.  Data
        # parallelism is request-level — run one engine per dp replica
        # (COMPONENTS.md §2.4) — so the mesh here must be tp-only.
        self.mesh = mesh
        tp = 1
        if mesh is not None:
            from ..parallel.mesh import DP_AXIS, TP_AXIS

            if dict(mesh.shape).get(DP_AXIS, 1) != 1:
                raise ValueError(
                    "serving engine shards tensor-parallel only; run one "
                    "engine per dp replica for data parallelism"
                )
            tp = dict(mesh.shape).get(TP_AXIS, 1)
            if tp > 1:
                from ..parallel.tp import shard_weights_tp

                weights = shard_weights_tp(weights, mesh, self.config)
            else:
                # Single-device mesh: only pins the replica's arrays to its
                # own device (no resharding, no shard_map overhead).
                from ..parallel.sharding import shard_weights

                weights = shard_weights(weights, mesh, self.config)
        self._tp = tp
        self.weights = weights
        self.n_slots = n_slots
        self.mode = mode
        # "host": per-request reference-parity xorshift samplers, one forward
        # per scheduler step.  "device": forward+sampling chunked on device —
        # decode_chunk_steps tokens per dispatch per slot, per-request
        # temperature/top-p as [B] arrays (throughput mode; jax PRNG).
        self.sampling = sampling
        self.decode_chunk_steps = decode_chunk_steps
        # spec_k > 0: n-gram speculative decoding per slot (every slot
        # verifies spec_k drafts per round and emits 1..spec_k+1 tokens;
        # greedy slots accept by argmax match, temperature>0 slots by
        # sampled-token match — exact speculative sampling for the
        # deterministic drafter, inference/speculative.py
        # spec_round_batched).  Chunks pipeline
        # like the plain path: positions, last tokens, and per-slot
        # histories chain device-side between chunks (acceptance-dependent
        # advances are never needed on the host at dispatch time); the host
        # tracks positions as upper bounds until each chunk is processed.
        self.spec_k = spec_k
        if spec_k > 0 and (kv_layout != "paged" or sampling != "device"):
            raise ValueError(
                'speculative serving requires kv_layout="paged" and '
                'sampling="device"'
            )
        # Acceptance-adaptive speculation: a speculative round costs about
        # one plain decode step of HBM time (the weight stream dominates)
        # plus drafter/verify overhead, so it only pays while the measured
        # tokens-per-round multiplier stays above ``spec_min_accept``.
        # _process_spec_chunk tracks an EWMA of accepted tokens/round;
        # when it sinks below the threshold the engine falls back to plain
        # chunks (warmed at init) and re-probes speculation after
        # ``spec_probe_chunks`` plain chunks — so ``--spec`` can be left
        # on without underperforming plain decoding on low-acceptance
        # traffic (measured: spec at temperature 0.8 lost 414 vs 433
        # tok/s before this policy).
        self.spec_min_accept = spec_min_accept
        self.spec_probe_chunks = spec_probe_chunks
        self._spec_enabled = spec_k > 0
        self._spec_accept_ewma: float | None = None
        self._spec_plain_chunks = 0
        # Grace window: the FIRST chunks after (re)enable always measure
        # low — drafting histories are cold until a few periods of each
        # stream have generated — so the disable decision waits for
        # _SPEC_GRACE_CHUNKS processed spec chunks (measured: without it
        # the first chunk's 1.0 tokens/round disabled speculation for the
        # whole bench run).
        self._spec_chunks_seen = 0
        # Failed probes back off exponentially (measured: re-probing a
        # zero-acceptance stream every 16 chunks cost 3–6% aggregate —
        # each probe pays the grace chunks of unaccepted spec rounds).
        self._spec_probe_interval = spec_probe_chunks
        # Probes additionally gated on host-side bigram repetition in the
        # live streams (see the re-probe site): count of gated (suppressed)
        # probe checks, evaluated at _SPEC_GATE_RECHECK-chunk cadence once
        # the interval elapses; after _SPEC_GATE_MAX_HOLDS consecutive
        # holds a probe fires regardless (detector-blind-spot escape).
        self._spec_probes_gated = 0
        self._spec_gate_base = 0
        # prefix_cache: requests sharing a prompt prefix adopt the pages
        # that cover it instead of recomputing the prefill (refcounted +
        # LRU-cached pages, serving/paged_cache.py PageAllocator); admission
        # prefills then run only the prompt suffix with pos_start = matched
        # rows.  Composes with spec_k: the continued spec admission seeds
        # each slot's drafting history from a full-prompt array so the
        # adopted prefix stays draftable.
        self.prefix_cache = prefix_cache
        if prefix_cache and kv_layout != "paged":
            raise ValueError('prefix caching requires kv_layout="paged"')
        # prefill_chunk: bound the prefill work dispatched per scheduler
        # step.  A monolithic long-prompt prefill stalls every in-flight
        # stream's next token for its full duration; with a chunk limit the
        # prompt prefills ``prefill_chunk`` rows per step through the
        # continued-prefill path (the window scatters into the slot's pages
        # at pos_start = rows already done), and decode chunks for active
        # slots interleave between the pieces — inter-token latency is
        # bounded by one chunk's prefill time regardless of prompt length.
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None:
            if kv_layout != "paged":
                raise ValueError('chunked prefill requires kv_layout="paged"')
            if prefill_chunk <= 0:
                raise ValueError("prefill_chunk must be positive")
            self.prefill_chunk = min(prefill_chunk, config.seq_len)
        # None = drain the queue into every free slot per step (TTFT-first);
        # a small value bounds how long in-flight streams stall behind
        # blocking prefills (inter-token-latency-first).
        self.max_admissions_per_step = max_admissions_per_step
        self._key = jax.random.PRNGKey(seed)
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= config.seq_len
        ) or (config.seq_len,)
        if self.prefill_chunk is not None:
            # The chunk window is a compiled prefill shape — make it a
            # bucket so warmup() covers it.
            self.prefill_buckets = tuple(
                sorted(set(self.prefill_buckets) | {self.prefill_chunk})
            )

        # KV layout: "dense" reserves seq_len rows per slot (the reference's
        # per-request dense cache, batched); "paged" backs all slots with a
        # shared page pool + per-slot page tables (serving/paged_cache.py) so
        # resident KV memory tracks actual tokens — at 8B/4k the dense slots
        # would cost more HBM than the weights.
        self.kv_layout = kv_layout
        if kv_layout == "paged":
            from .paged_cache import PageAllocator, init_paged_cache

            max_pages_per_slot = -(-self.config.seq_len // page_size)
            if n_pages is None:
                # Default pool: half of the dense footprint, + null page.
                n_pages = 1 + max(2, (n_slots * max_pages_per_slot) // 2)
            self.cache = init_paged_cache(
                self.config, n_pages, page_size, dtype=cache_dtype
            )
            if mesh is not None:
                # Pool [L, P, n_kv, page, hd]: kv heads on tp, like the
                # dense cache (GQA keeps attention tp-local).  The INT8
                # pool's per-row scales [L, P, n_kv, page] shard the same
                # kv axis — matching the shard_map forward's cache specs.
                from ..parallel.tp import shard_cache_tp

                self.cache = shard_cache_tp(self.cache, mesh)
            self.allocator = PageAllocator(n_pages, n_slots, max_pages_per_slot)
            self.page_size = page_size
            self._scratch_cache = None
        elif kv_layout == "dense":
            if cache_dtype == "int8" or cache_dtype == jnp.int8:
                raise ValueError(
                    'INT8 KV cache requires kv_layout="paged" (the dense '
                    "layout has no per-row scale storage)"
                )
            self.cache = init_kv_cache(config, n_slots, dtype=cache_dtype)
            self._scratch_cache: KVCache = init_kv_cache(config, 1, dtype=cache_dtype)
            if mesh is not None:
                from ..parallel.tp import shard_cache_tp

                self.cache = shard_cache_tp(self.cache, mesh)
                self._scratch_cache = shard_cache_tp(self._scratch_cache, mesh)
            self.allocator = None
        else:
            raise ValueError(f"unknown kv_layout: {kv_layout!r}")

        # Host-side slot bookkeeping.
        self.slot_request: list[Optional[Request]] = [None] * n_slots
        self.slot_pos = np.zeros(n_slots, np.int32)  # next write position
        self.slot_token = np.zeros(n_slots, np.int32)  # last sampled token
        # Speculative mode: dispatched-but-unprocessed rounds per slot (each
        # emits >= 1 token — the certainty floor for _provably_done).
        self._spec_pending_rounds = np.zeros(n_slots, np.int64)
        self.queue: list[Request] = []
        self.completed: list[Request] = []
        self._decode_steps = 0
        self._decode_tokens = 0
        self._prefix_hits = 0
        self._prefix_rows_reused = 0
        # Chunked prefill: slot → {"req", "done", "plen"} for requests whose
        # prompt is mid-prefill.  A partial slot holds pages and its slot
        # index but stays out of ``slot_request`` (and thus out of every
        # decode active mask) until its final chunk samples the first token.
        self._partials: dict[int, dict] = {}
        self._partial_waves = 0
        # Device-sampling mode pipelines decode chunks: the next chunk is
        # dispatched BEFORE the previous chunk's tokens are fetched, so the
        # device→host round-trip hides behind the next chunk's compute.
        # Holds {toks, n_steps, pos0, active, reqs} for the one chunk whose
        # results are still on device.
        self._inflight: Optional[dict] = None

        if tp > 1:
            # shard_map forward: kernels see LOCAL pool/weight shards, so
            # the paged flash kernels run under tensor parallelism (no
            # GSPMD replication — the r2 allow_paged_flash gate is gone).
            from ..parallel.tp import make_tp_forward

            fwd = make_tp_forward(self.config, mesh, mode=mode)
        else:
            fwd = functools.partial(qwen3_forward, self.config, mode=mode)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(weights, tokens, cache, pos, active):
            return fwd(weights, tokens, cache, pos, write_mask=active)

        @functools.partial(jax.jit, donate_argnums=(3,), static_argnums=(9,))
        def _decode_chunked(
            weights, prev_last, fresh, cache, pos, active, temps, topps, key, n_steps
        ):
            from ..ops.sampling import sample_tokens_jax

            # Starting tokens: slots freshly (re)admitted since the last
            # chunk take the host-provided token (fresh >= 0); continuing
            # slots take the previous chunk's last sampled token, which
            # stays device-resident — the pipelined dispatch never waits for
            # the previous chunk's results to reach the host.
            tokens = jnp.where(fresh >= 0, fresh, prev_last)[:, None]

            def body(carry, _):
                tokens, cache, pos, key = carry
                logits, cache = fwd(weights, tokens, cache, pos, write_mask=active)
                key, sub = jax.random.split(key)
                nxt = sample_tokens_jax(logits, sub, temps, topps)
                return (nxt[:, None], cache, pos + 1, key), nxt

            (last, cache, _, _), toks = jax.lax.scan(
                body, (tokens, cache, pos, key), None, length=n_steps
            )
            # ``last`` ( == toks[-1]) is returned separately so the next
            # pipelined dispatch can chain it WITHOUT a host-side slice op —
            # an eager op on a pending array blocks until the chunk lands.
            return toks, last[:, 0], cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill1(weights, tokens, cache, out_idx):
            return fwd(
                weights, tokens, cache, jnp.zeros(1, jnp.int32), out_idx=out_idx,
                fresh_prefill=True,
            )

        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def _insert(cache, scratch, s_len: int, slot):
            def ins(big, small):
                # cache layout [L, B, kv, T, hd]: copy the scratch slot's
                # first s_len rows of every head into the target slot.
                window = jax.lax.dynamic_slice_in_dim(small, 0, s_len, axis=3)
                return jax.lax.dynamic_update_slice(
                    big, window.astype(big.dtype), (0, slot, 0, 0, 0)
                )

            return KVCache(ins(cache.k, scratch.k), ins(cache.v, scratch.v))

        # Paged variants: same step functions with the page pool as the
        # cache and per-slot page tables as an extra input.
        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode_paged(weights, tokens, cache, pos, active, tables):
            return fwd(
                weights, tokens, cache, pos, write_mask=active, page_table=tables
            )

        @functools.partial(jax.jit, donate_argnums=(3,), static_argnums=(10,))
        def _decode_chunked_paged(
            weights, prev_last, fresh, cache, pos, active, temps, topps, key,
            tables, n_steps,
        ):
            from ..ops.sampling import sample_tokens_jax

            tokens = jnp.where(fresh >= 0, fresh, prev_last)[:, None]

            def body(carry, _):
                tokens, cache, pos, key = carry
                logits, cache = fwd(
                    weights, tokens, cache, pos, write_mask=active, page_table=tables
                )
                key, sub = jax.random.split(key)
                nxt = sample_tokens_jax(logits, sub, temps, topps)
                return (nxt[:, None], cache, pos + 1, key), nxt

            (last, cache, _, _), toks = jax.lax.scan(
                body, (tokens, cache, pos, key), None, length=n_steps
            )
            # ``last`` ( == toks[-1]) is returned separately so the next
            # pipelined dispatch can chain it WITHOUT a host-side slice op —
            # an eager op on a pending array blocks until the chunk lands.
            return toks, last[:, 0], cache

        @functools.partial(jax.jit, donate_argnums=(5,), static_argnums=(13, 14))
        def _decode_spec_paged(
            weights, prev_last, fresh, fresh_pos, prev_pos, cache, active,
            temps, topps, key, tables, hist, hlen, n_rounds, k,
        ):
            """n_rounds batched speculative rounds on device: draft → verify
            (S=k+1) → accept, per slot (inference/speculative.py).

            Pipelinable like the plain chunk: slots with ``fresh >= 0`` start
            from host-known (token, position); the rest chain the previous
            chunk's device-resident ``last``/``pos`` outputs, and hist/hlen
            likewise chain (admission prefills update their rows on device).
            Returns (toks [n_rounds, B, k+1], counts [n_rounds, B], last [B],
            pos [B], hist, hlen, cache).
            """
            from ..inference.speculative import spec_round_batched

            tokens = jnp.where(fresh >= 0, fresh, prev_last)
            pos = jnp.where(fresh >= 0, fresh_pos, prev_pos)

            def body(carry, _):
                return spec_round_batched(fwd, weights, carry, k, tables, active)

            carry = (tokens, cache, pos, hist, hlen, temps, topps, key)
            (last, cache, pos, hist, hlen, _, _, _), (toks, counts) = (
                jax.lax.scan(body, carry, None, length=n_rounds)
            )
            return toks, counts, last, pos, hist, hlen, cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_paged_sampled_spec(
            weights, tokens, cache, out_idx, tables, temps, topps, key,
            slots, fresh_in, hist_in, hlen_in,
        ):
            """Deferred admission for speculative mode: like
            ``_prefill_paged_sampled`` plus device-side history seeding —
            each admitted slot's hist row becomes prompt + first token (so
            the invariant "hist ends with the pending input token" holds
            when the already-dispatched chunk consumes it)."""
            from ..ops.sampling import sample_tokens_jax

            logits, cache = _prefill_paged_inner(
                weights, tokens, cache, out_idx, tables
            )
            toks = sample_tokens_jax(logits, key, temps, topps)
            fresh_out = fresh_in.at[slots].set(toks, mode="drop")
            hist = hist_in.at[slots, : tokens.shape[1]].set(tokens, mode="drop")
            hist = hist.at[slots, out_idx + 1].set(toks, mode="drop")
            hlen = hlen_in.at[slots].set(out_idx + 2, mode="drop")
            return toks, fresh_out, hist, hlen, cache

        def _prefill_paged_inner(weights, tokens, cache, out_idx, tables):
            # Batched prefill straight into the shared pool: pos_start = 0
            # means the cache-prefix part is skipped; each row's K/V window
            # scatters into that request's own pages (no scratch cache /
            # insert step), so any number of admissions share one weight
            # stream.
            b = tokens.shape[0]
            return fwd(
                weights,
                tokens,
                cache,
                jnp.zeros(b, jnp.int32),
                out_idx=out_idx,
                page_table=tables,
                fresh_prefill=True,
            )

        _prefill_paged = jax.jit(_prefill_paged_inner, donate_argnums=(2,))

        def _prefill_paged_cont_inner(weights, tokens, cache, out_idx, tables, pos):
            # Continued prefill for prefix-cache hits: the window holds only
            # the prompt SUFFIX, starting at pos_start = matched rows; the
            # adopted prefix pages are read as a cache prefix (so
            # fresh_prefill stays False and attention takes the
            # split/paged-window path).  Rows with pos == 0 (no-hit requests
            # grouped in) are equivalent to the fresh path minus the splash
            # kernel routing.
            return fwd(
                weights, tokens, cache, pos, out_idx=out_idx, page_table=tables
            )

        _prefill_paged_cont = jax.jit(_prefill_paged_cont_inner, donate_argnums=(2,))

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_paged_sampled_cont(
            weights, tokens, cache, out_idx, tables, pos, temps, topps, key,
            slots, fresh_in,
        ):
            # Deferred-admission variant of the continued prefill (same
            # contract as _prefill_paged_sampled).
            from ..ops.sampling import sample_tokens_jax

            logits, cache = _prefill_paged_cont_inner(
                weights, tokens, cache, out_idx, tables, pos
            )
            toks = sample_tokens_jax(logits, key, temps, topps)
            fresh_out = fresh_in.at[slots].set(toks, mode="drop")
            return toks, fresh_out, cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_paged_sampled_spec_cont(
            weights, tokens, cache, out_idx, tables, pos, temps, topps, key,
            slots, fresh_in, hist_in, hlen_in, full_rows,
        ):
            """Speculative × prefix-cache admission: the prefill window is
            only the prompt SUFFIX, but the drafting history must hold the
            whole prompt (including the adopted prefix) — ``full_rows``
            [k_pad, seq_len] carries it host→device (a few hundred KB, paid
            once per admission wave, off the decode hot path)."""
            from ..ops.sampling import sample_tokens_jax

            logits, cache = _prefill_paged_cont_inner(
                weights, tokens, cache, out_idx, tables, pos
            )
            toks = sample_tokens_jax(logits, key, temps, topps)
            fresh_out = fresh_in.at[slots].set(toks, mode="drop")
            end = pos + out_idx  # last real prompt row per admitted request
            hist = hist_in.at[slots].set(full_rows, mode="drop")
            hist = hist.at[slots, end + 1].set(toks, mode="drop")
            hlen = hlen_in.at[slots].set(end + 2, mode="drop")
            return toks, fresh_out, hist, hlen, cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_paged_sampled(
            weights, tokens, cache, out_idx, tables, temps, topps, key,
            slots, fresh_in,
        ):
            # Device-sampling mode: first tokens are drawn on device too, so
            # an admission fetches k int32s instead of k × vocab logits.
            # The sampled tokens are additionally scattered into the [B]
            # ``fresh`` vector (slot-indexed; padding rows carry slot ==
            # n_slots and drop) so the NEXT decode chunk can chain them
            # entirely device-side — the scheduler never waits for the
            # prefill before dispatching the chunk behind it.
            from ..ops.sampling import sample_tokens_jax

            logits, cache = _prefill_paged_inner(
                weights, tokens, cache, out_idx, tables
            )
            toks = sample_tokens_jax(logits, key, temps, topps)
            fresh_out = fresh_in.at[slots].set(toks, mode="drop")
            return toks, fresh_out, cache

        self._decode = _decode
        self._decode_chunked = _decode_chunked
        self._prefill1 = _prefill1
        self._insert = _insert
        self._decode_paged = _decode_paged
        self._decode_chunked_paged = _decode_chunked_paged
        self._decode_spec_paged = _decode_spec_paged
        self._prefill_paged_sampled_spec = _prefill_paged_sampled_spec
        self._prefill_paged = _prefill_paged
        self._prefill_paged_sampled = _prefill_paged_sampled
        self._prefill_paged_cont = _prefill_paged_cont
        self._prefill_paged_sampled_cont = _prefill_paged_sampled_cont
        self._prefill_paged_sampled_spec_cont = _prefill_paged_sampled_spec_cont

    # ------------------------------------------------------------------ api
    def warmup(self) -> None:
        """Compile every serving step function ahead of admission so the
        first requests' TTFT reflects steady-state latency, not XLA compile
        time (compiles in some deployments cost minutes).

        Safe on live state: prefill only touches the scratch cache (fully
        overwritten at each admission) and the decode warmup runs with all
        slots inactive, so the write mask discards its cache updates.
        """
        warm_buckets = self._warm_buckets()
        paged = self.kv_layout == "paged"
        if paged:
            # Group admission compiles one shape per (bucket, padded group
            # size); zeroed page tables route the warmup writes into the
            # reserved null page.
            group_sizes = sorted({self._pad_group(k) for k in range(1, self.n_slots + 1)})
            for b in warm_buckets:
                s_pad = min(b, self.config.seq_len)
                for k in group_sizes:
                    tables = jnp.zeros(
                        (k, self.allocator.max_pages_per_slot), jnp.int32
                    )
                    toks0 = jnp.zeros((k, s_pad), jnp.int32)
                    idx0 = jnp.zeros(k, jnp.int32)
                    if self.spec_k:
                        out, _, _, _, self.cache = self._prefill_paged_sampled_spec(
                            self.weights, toks0, self.cache, idx0, tables,
                            jnp.zeros(k, jnp.float32), jnp.ones(k, jnp.float32),
                            jax.random.PRNGKey(0),
                            jnp.full(k, self.n_slots, jnp.int32),  # all dropped
                            jnp.full(self.n_slots, -1, jnp.int32),
                            jnp.zeros((self.n_slots, self.config.seq_len), jnp.int32),
                            jnp.zeros(self.n_slots, jnp.int32),
                        )
                        np.asarray(out)
                    if self.sampling == "device":
                        # Spec engines warm the PLAIN sampled admission too:
                        # the acceptance-adaptive fallback admits through it
                        # while speculation is disabled.
                        out, _, self.cache = self._prefill_paged_sampled(
                            self.weights, toks0, self.cache, idx0, tables,
                            jnp.zeros(k, jnp.float32), jnp.ones(k, jnp.float32),
                            jax.random.PRNGKey(0),
                            jnp.full(k, self.n_slots, jnp.int32),  # all dropped
                            jnp.full(self.n_slots, -1, jnp.int32),
                        )
                    else:
                        out, self.cache = self._prefill_paged(
                            self.weights, toks0, self.cache, idx0, tables
                        )
                    np.asarray(out)
                    if self.prefill_chunk is not None:
                        # Intermediate chunked-prefill waves use the PLAIN
                        # continued prefill in every sampling mode (window =
                        # the chunk bucket).
                        if b == self.prefill_chunk:
                            out, self.cache = self._prefill_paged_cont(
                                self.weights, toks0, self.cache, idx0, tables,
                                jnp.zeros(k, jnp.int32),
                            )
                            np.asarray(out)
                    if self.prefix_cache or self.prefill_chunk is not None:
                        # Prefix-cache hits and final chunked-prefill waves
                        # compile a second (continued) prefill per shape;
                        # warm it so the first shared prompt doesn't stall
                        # mid-serving.
                        pos0 = jnp.zeros(k, jnp.int32)
                        if self.spec_k:
                            out, _, _, _, self.cache = (
                                self._prefill_paged_sampled_spec_cont(
                                    self.weights, toks0, self.cache, idx0,
                                    tables, pos0,
                                    jnp.zeros(k, jnp.float32),
                                    jnp.ones(k, jnp.float32),
                                    jax.random.PRNGKey(0),
                                    jnp.full(k, self.n_slots, jnp.int32),
                                    jnp.full(self.n_slots, -1, jnp.int32),
                                    jnp.zeros(
                                        (self.n_slots, self.config.seq_len),
                                        jnp.int32,
                                    ),
                                    jnp.zeros(self.n_slots, jnp.int32),
                                    jnp.zeros(
                                        (k, self.config.seq_len), jnp.int32
                                    ),
                                )
                            )
                            np.asarray(out)
                        if self.sampling == "device":
                            out, _, self.cache = self._prefill_paged_sampled_cont(
                                self.weights, toks0, self.cache, idx0, tables,
                                pos0,
                                jnp.zeros(k, jnp.float32), jnp.ones(k, jnp.float32),
                                jax.random.PRNGKey(0),
                                jnp.full(k, self.n_slots, jnp.int32),
                                jnp.full(self.n_slots, -1, jnp.int32),
                            )
                        else:
                            out, self.cache = self._prefill_paged_cont(
                                self.weights, toks0, self.cache, idx0, tables, pos0
                            )
                        np.asarray(out)
        else:
            for b in warm_buckets:
                s_pad = min(b, self.config.seq_len)
                logits, self._scratch_cache = self._prefill1(
                    self.weights,
                    jnp.zeros((1, s_pad), jnp.int32),
                    self._scratch_cache,
                    jnp.asarray([0], jnp.int32),
                )
                # Warm the per-bucket slot insert too (slot 0's stale rows
                # sit beyond any future request's position until
                # overwritten).
                self.cache = self._insert(self.cache, self._scratch_cache, s_pad, 0)
                np.asarray(logits)
        inactive = jnp.zeros(self.n_slots, bool)
        if self.spec_k:
            # Warm EVERY reachable speculative round bucket: the context-end
            # taper selects successively smaller buckets (static jit arg), and
            # a mid-serving compile stalls in-flight streams.  The plain-step
            # tail fallback is warmed by the host-sampling branch's single
            # decode below.
            k = self.spec_k
            top = self._spec_n_rounds(self.config.seq_len // (k + 1))
            for n_rounds in [rb for rb in self._SPEC_ROUND_BUCKETS if rb <= top]:
                zeros = jnp.zeros(self.n_slots, jnp.int32)
                toks, *_, self.cache = self._decode_spec_paged(
                    self.weights,
                    zeros,
                    jnp.full(self.n_slots, -1, jnp.int32),
                    jnp.asarray(self.slot_pos),
                    zeros,
                    self.cache,
                    inactive,
                    jnp.zeros(self.n_slots, jnp.float32),
                    jnp.ones(self.n_slots, jnp.float32),
                    jax.random.PRNGKey(0),
                    jnp.asarray(self.allocator.tables),
                    jnp.zeros((self.n_slots, self.config.seq_len), jnp.int32),
                    zeros,
                    n_rounds,
                    k,
                )
                np.asarray(toks)
        if self.sampling == "device":
            # Warmed for spec engines too: the acceptance-adaptive policy
            # (step()) falls back to plain chunks when the measured
            # speculative multiplier drops below spec_min_accept, and a
            # cold chunk fn would compile mid-serving.
            n_steps = max(1, min(self.decode_chunk_steps, self.config.seq_len))
            args = (
                self.weights,
                jnp.zeros(self.n_slots, jnp.int32),
                jnp.zeros(self.n_slots, jnp.int32),
                self.cache,
                jnp.asarray(self.slot_pos),
                inactive,
                jnp.zeros(self.n_slots, jnp.float32),
                jnp.ones(self.n_slots, jnp.float32),
                jax.random.PRNGKey(0),
            )
            if paged:
                toks, _, self.cache = self._decode_chunked_paged(
                    *args, jnp.asarray(self.allocator.tables), n_steps
                )
            else:
                toks, _, self.cache = self._decode_chunked(*args, n_steps)
            np.asarray(toks)
        if self.sampling != "device" or self.spec_k:
            args = (
                self.weights,
                jnp.asarray(self.slot_token[:, None]),
                self.cache,
                jnp.asarray(self.slot_pos),
                inactive,
            )
            if paged:
                logits, self.cache = self._decode_paged(
                    *args, jnp.asarray(self.allocator.tables)
                )
            else:
                logits, self.cache = self._decode(*args)
            np.asarray(logits)

    def submit(self, request: Request) -> None:
        request.submit_time = time.perf_counter()
        request.state = RequestState.QUEUED
        request._sampler = Sampler(request.temperature, request.topp, request.seed)
        self.queue.append(request)

    @property
    def active_count(self) -> int:
        return sum(r is not None for r in self.slot_request)

    @property
    def has_work(self) -> bool:
        return (
            bool(self.queue)
            or self.active_count > 0
            or self._inflight is not None
            or bool(self._partials)
        )

    def _ladder(self) -> list[int]:
        """The geometric widths above the largest declared bucket
        (last bucket × 2^k, capped at seq_len) — the single source of
        truth for both _bucket and _warm_buckets, so the widths admission
        picks and the widths warmup compiles cannot drift."""
        out = []
        b = self.prefill_buckets[-1]
        while b < self.config.seq_len:
            b = min(b * 2, self.config.seq_len)
            out.append(b)
        return out

    def _warm_buckets(self) -> list[int]:
        """Prefill widths warmup compiles: the declared buckets plus the
        ladder rungs (_bucket's shapes for prompts beyond the largest
        bucket) — a cold ladder shape costs seconds of remote compile
        MID-SERVING otherwise (measured 45 s p50 TTFT on 320-token
        prompts with only a 128 bucket warmed).  Capped via
        QWEN3_TPU_WARMUP_LADDER_MAX: huge windows warm lazily."""
        ladder_max = int(
            os.environ.get(
                "QWEN3_TPU_WARMUP_LADDER_MAX",
                min(self.config.seq_len, 4096),
            )
        )
        warm = list(self.prefill_buckets)
        warm += [b for b in self._ladder() if b <= max(ladder_max, warm[-1])]
        cold = [b for b in self._ladder() if b > max(ladder_max, warm[-1])]
        if cold and not getattr(self, "_cold_ladder_warned", False):
            self._cold_ladder_warned = True
            # Deliberate but not silent: the first prompt that reaches one
            # of these widths pays a fresh remote compile mid-serving (25+
            # minute episodes observed) — operators with long prompts should
            # raise the cap knowingly.
            logger.warning(
                "warmup: ladder widths %s left cold (QWEN3_TPU_WARMUP_LADDER_MAX"
                "=%d); the first prompt needing one compiles mid-serving — "
                "raise the env cap to pre-warm them",
                cold,
                ladder_max,
            )
        return sorted(set(warm))

    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        # Above the largest bucket: the geometric ladder.  Every distinct
        # prefill width is a compiled program and a compile through this
        # deployment's remote-compile hop costs seconds; the previous
        # behavior (return the last bucket, which the caller's
        # max(suffix, bucket) turns into the RAW ragged suffix) compiled
        # one program per distinct prompt length — 169 s p50 TTFT on the
        # prefix-off serve bench.  The ladder bounds distinct shapes to
        # log2(seq_len / last_bucket) at ≤ 2× padding waste; pass more
        # buckets to tighten the grid.
        for b in self._ladder():
            if n <= b:
                return b
        return self.config.seq_len

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.slot_request):
            if r is None:
                return i
        return None

    # ------------------------------------------------------------ scheduling
    def step(self) -> list[tuple[Request, int]]:
        """One scheduler iteration. Returns (request, token) pairs emitted."""
        emitted: list[tuple[Request, int]] = []
        # Drain the queue into free slots before the decode chunk: under
        # bursty arrivals, one-admission-per-chunk would add a full chunk of
        # decode latency to each queued request's TTFT.  Each admission is a
        # blocking prefill that delays active streams' next token, so
        # max_admissions_per_step can bound the stall.
        deferred = self.sampling == "device" and self.kv_layout == "paged"
        prev = self._inflight
        # Acceptance-adaptive speculation: when the policy flipped modes
        # since the previous dispatch, drain the mismatched pipeline first
        # — chunk dicts of the two kinds don't chain into each other, and
        # a drained pipeline (prev=None) rebuilds from exact host state.
        use_spec = self.spec_k > 0 and self._spec_enabled
        if self.spec_k and prev is not None and ("hist" in prev) != use_spec:
            self._inflight = None
            if "hist" in prev:
                self._process_spec_chunk(prev, emitted)
            else:
                self._process_chunk(prev, emitted)
            prev = None
        # Token vector feeding the next chunk's (re)admitted slots; admission
        # prefills chain their sampled first tokens into it device-side.
        fresh = self._fresh_base(prev) if deferred else None
        # Speculative mode: per-slot histories chain on device like `last`;
        # with no chunk in flight they rebuild from exact host state.
        spec_state = None
        if use_spec:
            if prev is not None:
                spec_state = {"hist": prev["hist"], "hlen": prev["hlen"]}
            else:
                hist_in, hlen_in = self._spec_host_hist()
                spec_state = {"hist": hist_in, "hlen": hlen_in}
        pending: list[dict] = []
        admitted = 0
        if self.prefill_chunk is not None:
            # Chunked prefill: advance every mid-prefill slot by one chunk
            # (and start new partials from the queue head) BEFORE group
            # admission, so short prompts still admit into the remaining
            # free slots this step.  New partial starts count against
            # max_admissions_per_step — each adds a chunk-wide prefill to
            # this step's stall, exactly what the budget exists to bound.
            fresh, started = self._advance_partials(
                emitted,
                fresh,
                pending if deferred else None,
                spec_state,
                budget=self.max_admissions_per_step,
            )
            admitted += started
        while True:
            budget = (
                None
                if self.max_admissions_per_step is None
                else self.max_admissions_per_step - admitted
            )
            if budget is not None and budget <= 0:
                break
            if self.kv_layout == "paged":
                k, fresh = self._admit_group(
                    emitted,
                    budget,
                    fresh=fresh,
                    pending=pending if deferred else None,
                    spec_state=spec_state,
                )
            else:
                k = 1 if self._admit_one(emitted) else 0
            if k == 0:
                break
            admitted += k
        if use_spec:
            # Pipelined speculative chunks: dispatch first, then process the
            # previous chunk while the new one computes (same contract as the
            # plain path below).
            self._inflight = None
            chunk = None
            if self.active_count and not self._all_live_finish_within(prev):
                chunk = self._dispatch_spec_chunk(
                    prev, fresh, spec_state["hist"], spec_state["hlen"]
                )
                self._inflight = chunk
            for p in pending:
                self._process_admits(p, emitted)
            if prev is not None:
                self._process_spec_chunk(prev, emitted)
            # Context-end taper: live slots the spec chunk couldn't cover
            # (fewer than k+1 rows of room) advance by plain one-token steps
            # on exact state — one near-full stream must not collapse the
            # whole batch out of speculative mode.
            tail = [
                slot
                for slot, r in enumerate(self.slot_request)
                if r is not None
                and not (chunk is not None and chunk["active"][slot])
                and not self._provably_done(r, slot)
                and int(self.slot_pos[slot]) < self.config.seq_len
            ]
            if tail:
                self._decode_all(emitted, slots=tail)
        elif self.sampling == "device":
            # Pipelined chunks: dispatch the next chunk first, then fetch +
            # process the previous one while the new chunk computes.  When
            # every live slot deterministically finishes inside the in-flight
            # chunk (length limits are exact; EOS can only finish *earlier*),
            # the next chunk would be all zombies — skip it and let the next
            # step admit into the freed slots instead.
            self._inflight = None
            if self.active_count and not self._all_live_finish_within(prev):
                self._inflight = self._dispatch_chunk(prev, fresh)
                if self.spec_k:
                    # Speculation adaptively disabled: count plain chunks
                    # toward the periodic re-probe (acceptance patterns
                    # change with traffic; a probe re-measures cheaply).
                    # The probe itself is gated on a host-side repetition
                    # check: the bigram drafter can only accept when recent
                    # continuations repeat bigrams, so probing traffic with
                    # no repeated bigram in any live stream is guaranteed
                    # zero acceptance (measured ≈ −2% engine-wide per probe
                    # cycle, EVIDENCE §2b) — the counter HOLDS at the
                    # interval so the probe fires as soon as repetition
                    # appears instead.
                    self._spec_plain_chunks += 1
                    if self._spec_plain_chunks >= self._spec_probe_interval:
                        # Escape hatch: after _SPEC_GATE_MAX_HOLDS gated
                        # boundaries, probe anyway — the detector's window
                        # cannot see repetition cycles longer than itself,
                        # and the pre-gate policy's unconditional-recovery
                        # guarantee must survive (bounded cost: one probe
                        # per MAX_HOLDS × recheck-cadence chunks).
                        if (
                            self._traffic_repetitive()
                            or self._spec_probes_gated - self._spec_gate_base
                            >= self._SPEC_GATE_MAX_HOLDS
                        ):
                            self._spec_enabled = True
                            self._spec_accept_ewma = None
                            self._spec_chunks_seen = 0
                            self._spec_plain_chunks = 0
                            self._spec_gate_base = self._spec_probes_gated
                        else:
                            self._spec_probes_gated += 1
                            # Re-check at probe cadence, not every chunk:
                            # hold the counter a recheck-interval short of
                            # the boundary.
                            self._spec_plain_chunks = max(
                                0,
                                self._spec_probe_interval
                                - self._SPEC_GATE_RECHECK,
                            )
            for p in pending:
                self._process_admits(p, emitted)
            if prev is not None:
                self._process_chunk(prev, emitted)
        elif self.active_count:
            self._decode_all(emitted)
        return emitted

    def run(self) -> list[Request]:
        """Drain queue + slots to completion; returns completed requests."""
        while self.has_work:
            self.step()
        return self.completed

    def _admit_one(self, emitted) -> bool:
        """Admit at most one queued request (dense layout; the paged layout
        admits in groups, see ``_admit_group``).  True if one was admitted."""
        slot = self._free_slot()
        if slot is None or not self.queue:
            return False
        req = self.queue.pop(0)
        prompt = req.prompt_tokens[: self.config.seq_len - 1]
        s_real = max(len(prompt), 1)
        s_pad = max(s_real, min(self._bucket(s_real), self.config.seq_len))
        padded = np.zeros((1, s_pad), np.int32)
        padded[0, :s_real] = prompt

        logits, self._scratch_cache = self._prefill1(
            self.weights,
            jnp.asarray(padded),
            self._scratch_cache,
            jnp.asarray([s_real - 1], jnp.int32),
        )
        self.cache = self._insert(self.cache, self._scratch_cache, s_pad, slot)

        first = req._sampler.sample(np.asarray(logits)[0])
        self._activate(req, slot, s_real, first, emitted)
        return True

    def _pad_group(self, k: int) -> int:
        """Pad a group size to a power of two (capped at n_slots) so batched
        prefills compile for O(log n_slots) batch shapes, not n_slots."""
        p = 1
        while p < k:
            p *= 2
        return min(p, self.n_slots)

    def _admit_group(
        self, emitted, budget: int | None, *, fresh=None, pending=None,
        spec_state=None,
    ) -> tuple[int, object]:
        """Admit a group of queued requests with ONE batched prefill (paged
        layout).  The group is the longest FCFS prefix that shares a prompt
        bucket, fits in free slots/pages, and respects ``budget``; a
        bucket change just ends the group — the step() loop immediately
        admits the next group.  Returns (number admitted, fresh-token
        vector).

        With ``pending`` (device-sampling mode), the admission is fully
        deferred: the prefill's sampled first tokens stay on device, chained
        into ``fresh`` for the next chunk dispatch, and the host fetches them
        only after that dispatch (``_process_admits``) — an admission never
        blocks the pipeline on a device→host round-trip."""
        free = [
            i
            for i, r in enumerate(self.slot_request)
            if r is None and i not in self._partials
        ]
        if not free or not self.queue:
            return 0, fresh
        limit = len(free) if budget is None else min(len(free), budget)
        # (request, prompt_len, hit_rows, hit_pages) — hit_* nonzero only
        # with prefix_cache on and an indexed prefix match.
        picks: list[tuple[Request, int, int, list[int]]] = []
        bucket = 0
        cont_group = False
        avail = self.allocator.free_pages
        for req in self.queue:
            if len(picks) == limit:
                break
            prompt_len = min(
                max(len(req.prompt_tokens), 1), self.config.seq_len - 1
            )
            if self.prefix_cache:
                hpages, hrows = self.allocator.match_prefix(
                    req.prompt_tokens[:prompt_len], self.page_size
                )
            else:
                hpages, hrows = [], 0
            # The prefill window holds only the prompt suffix on a hit; the
            # bucket (the compiled window shape) follows the suffix length.
            suffix = prompt_len - hrows
            if self.prefill_chunk is not None and suffix > self.prefill_chunk:
                # Long prompts prefill chunk-by-chunk (_advance_partials);
                # FCFS — end the group rather than skipping past it.
                break
            # Cap the padded window so pad-row cache writes stay inside the
            # request's window even after a prefix hit (hrows offset) — but
            # snap to a WARMED width whenever one covers the suffix under
            # the cap: an hrows-dependent ragged width is a fresh compile
            # per distinct prefix length, the exact mid-serving stall the
            # ladder exists to prevent.
            allowed = self.config.seq_len - hrows
            b_width = self._bucket(suffix)
            if b_width > allowed:
                fits = [
                    w for w in self._warm_buckets() if suffix <= w <= allowed
                ]
                b_width = min(fits) if fits else allowed
            s_pad = max(suffix, min(b_width, allowed))
            cont = hrows > 0
            if not picks:
                bucket, cont_group = s_pad, cont
            elif s_pad != bucket or cont != cont_group:
                # A bucket or fresh/continued mode change ends the group;
                # the step() loop admits the next group immediately.
                break
            # Reserve pages for the whole request up front (prompt + budget);
            # insufficient free pages → leave queued (admission backpressure,
            # FCFS: never skip past a request that doesn't fit).  Adopted
            # prefix pages are charged in full (conservative: a zero-ref
            # cached page leaves the allocatable pool when pinned).
            # Max position touched: pad rows write junk K/V up to
            # hrows + s_pad, and decode rows run from hrows + suffix to
            # hrows + suffix + max_new — the two overlap, so take the max
            # rather than summing (summing over-reserved by the pad width,
            # which matters once the ladder pads up to 2×).
            worst_rows = min(
                self.config.seq_len,
                hrows + max(s_pad, suffix + req.max_new_tokens + 1),
            )
            need = -(-worst_rows // self.page_size)
            if need > avail:
                break
            avail -= need
            picks.append((req, prompt_len, hrows, hpages))
        if not picks:
            if (
                self.active_count == 0
                and self._inflight is None
                and not self._partials
            ):
                head = self.queue[0]
                # Defer to _advance_partials only when IT would actually take
                # the head — it routes by the prefix-adjusted suffix, so the
                # suppression must use the same quantity (a head whose cached
                # -prefix suffix fits one chunk is ours; swallowing its pool
                # exhaustion here would livelock run()).
                if self.prefill_chunk is not None:
                    plen = min(
                        max(len(head.prompt_tokens), 1), self.config.seq_len - 1
                    )
                    if self.prefix_cache:
                        _, head_hrows = self.allocator.match_prefix(
                            head.prompt_tokens[:plen], self.page_size
                        )
                    else:
                        head_hrows = 0
                    if plen - head_hrows > self.prefill_chunk:
                        return 0, fresh  # chunked-prefill path owns this head
                raise RuntimeError(
                    f"request {head.request_id} needs more KV pages than the "
                    f"pool holds ({self.allocator.n_pages}); raise n_pages "
                    "or lower max_new_tokens"
                )
            return 0, fresh  # wait for active requests to release pages

        k = len(picks)
        k_pad = self._pad_group(k)
        del self.queue[:k]
        tokens = np.zeros((k_pad, bucket), np.int32)
        out_idx = np.zeros(k_pad, np.int32)
        pos0 = np.zeros(k_pad, np.int32)
        tables = np.zeros((k_pad, self.allocator.max_pages_per_slot), np.int32)
        slots: list[int] = []
        # Pin every pick's matched pages FIRST: a later pick's still-cached
        # (zero-ref) match must not be evicted by an earlier pick's
        # allocation.
        for i, (_, _, _, hpages) in enumerate(picks):
            if hpages:
                self.allocator.adopt(free[i], hpages)
        for i, (req, prompt_len, hrows, _) in enumerate(picks):
            slot = free[i]
            suffix = prompt_len - hrows
            worst_rows = min(
                self.config.seq_len,
                hrows + max(bucket, suffix + req.max_new_tokens + 1),
            )
            self.allocator.ensure_capacity(slot, worst_rows, self.page_size)
            tokens[i, :suffix] = req.prompt_tokens[hrows:prompt_len]
            out_idx[i] = suffix - 1
            pos0[i] = hrows
            tables[i] = self.allocator.tables[slot]
            slots.append(slot)
        if self.prefix_cache:
            # Index this admission's fully-covered prompt pages for future
            # reuse (already-indexed chains — including everything just
            # adopted — are skipped).
            for i, (req, prompt_len, hrows, _) in enumerate(picks):
                self.allocator.register_prefix(
                    slots[i], req.prompt_tokens[:prompt_len], self.page_size
                )
                if hrows:
                    self._prefix_hits += 1
                    self._prefix_rows_reused += hrows
        # Padding rows (i >= k) keep zero tokens and all-null page tables:
        # their K/V lands in the reserved null page, which no request's
        # position bound ever reads.

        if pending is not None:
            # Deferred (pipelined) admission — device-sampled first tokens.
            temps = np.zeros(k_pad, np.float32)
            topps = np.ones(k_pad, np.float32)
            for i, (req, _, _, _) in enumerate(picks):
                temps[i] = req.temperature
                topps[i] = req.topp
            assert fresh is not None  # step() invariant
            slots_arr = np.full(k_pad, self.n_slots, np.int32)  # pad → drop
            slots_arr[:k] = slots
            self._key, sub = jax.random.split(self._key)
            if cont_group and spec_state is not None:
                # Prefix-cache hit under speculative serving: suffix-only
                # prefill + full-prompt history seeding (the adopted prefix
                # must be draftable).
                full_rows = np.zeros((k_pad, self.config.seq_len), np.int32)
                for i, (req, prompt_len, _, _) in enumerate(picks):
                    full_rows[i, :prompt_len] = req.prompt_tokens[:prompt_len]
                toks, fresh, hist, hlen, self.cache = (
                    self._prefill_paged_sampled_spec_cont(
                        self.weights,
                        jnp.asarray(tokens),
                        self.cache,
                        jnp.asarray(out_idx),
                        jnp.asarray(tables),
                        jnp.asarray(pos0),
                        jnp.asarray(temps),
                        jnp.asarray(topps),
                        sub,
                        jnp.asarray(slots_arr),
                        jnp.asarray(fresh),
                        jnp.asarray(spec_state["hist"]),
                        jnp.asarray(spec_state["hlen"]),
                        jnp.asarray(full_rows),
                    )
                )
                spec_state["hist"] = hist
                spec_state["hlen"] = hlen
            elif cont_group:
                # Prefix-cache hits: suffix-only prefill at pos_start =
                # matched rows.
                toks, fresh, self.cache = self._prefill_paged_sampled_cont(
                    self.weights,
                    jnp.asarray(tokens),
                    self.cache,
                    jnp.asarray(out_idx),
                    jnp.asarray(tables),
                    jnp.asarray(pos0),
                    jnp.asarray(temps),
                    jnp.asarray(topps),
                    sub,
                    jnp.asarray(slots_arr),
                    jnp.asarray(fresh),
                )
            elif spec_state is not None:
                # Speculative mode also seeds each admitted slot's device
                # history row (prompt + first token) so the next chunk can
                # draft for it without a host round-trip.
                toks, fresh, hist, hlen, self.cache = (
                    self._prefill_paged_sampled_spec(
                        self.weights,
                        jnp.asarray(tokens),
                        self.cache,
                        jnp.asarray(out_idx),
                        jnp.asarray(tables),
                        jnp.asarray(temps),
                        jnp.asarray(topps),
                        sub,
                        jnp.asarray(slots_arr),
                        jnp.asarray(fresh),
                        jnp.asarray(spec_state["hist"]),
                        jnp.asarray(spec_state["hlen"]),
                    )
                )
                spec_state["hist"] = hist
                spec_state["hlen"] = hlen
            else:
                toks, fresh, self.cache = self._prefill_paged_sampled(
                    self.weights,
                    jnp.asarray(tokens),
                    self.cache,
                    jnp.asarray(out_idx),
                    jnp.asarray(tables),
                    jnp.asarray(temps),
                    jnp.asarray(topps),
                    sub,
                    jnp.asarray(slots_arr),
                    jnp.asarray(fresh),
                )
            for i, (req, prompt_len, _, _) in enumerate(picks):
                self._occupy(req, slots[i], prompt_len)
            # _process_admits consumes (request, prompt_len) pairs.
            pending.append(
                {"toks": toks, "picks": [(r, pl) for r, pl, _, _ in picks]}
            )
        else:
            if cont_group:
                logits, self.cache = self._prefill_paged_cont(
                    self.weights,
                    jnp.asarray(tokens),
                    self.cache,
                    jnp.asarray(out_idx),
                    jnp.asarray(tables),
                    jnp.asarray(pos0),
                )
            else:
                logits, self.cache = self._prefill_paged(
                    self.weights,
                    jnp.asarray(tokens),
                    self.cache,
                    jnp.asarray(out_idx),
                    jnp.asarray(tables),
                )
            # Slice off the power-of-two padding rows before the fetch —
            # k_pad - k vocab-wide logit rows never leave the device.
            logits_np = np.asarray(logits[:k])
            for i, (req, prompt_len, _, _) in enumerate(picks):
                self._occupy(req, slots[i], prompt_len)
                self._first_token(req, req._sampler.sample(logits_np[i]), emitted)
        return k, fresh

    def _advance_partials(self, emitted, fresh, pending, spec_state, *, budget=None):
        """Chunked prefill driver (``prefill_chunk`` set): start new partial
        prefills from the queue head and advance every partial by ONE chunk
        this step.  Intermediate chunks run the plain continued prefill
        (logits never fetched); a partial's final chunk goes through the
        same sampled/cont admission contract as ``_admit_group`` — so the
        feature composes with device sampling, speculative serving, and
        prefix caching unchanged.  ``budget`` caps NEW partial starts (the
        max_admissions_per_step stall bound).  Returns (fresh, n_started)."""
        chunk = self.prefill_chunk
        started = 0
        # Start new partials FCFS from the queue head.  Prompts whose
        # (suffix after a prefix-cache hit) fits one chunk stay queued for
        # the normal group admission.
        while self.queue:
            if budget is not None and started >= budget:
                break
            req = self.queue[0]
            prompt_len = min(
                max(len(req.prompt_tokens), 1), self.config.seq_len - 1
            )
            if self.prefix_cache:
                hpages, hrows = self.allocator.match_prefix(
                    req.prompt_tokens[:prompt_len], self.page_size
                )
            else:
                hpages, hrows = [], 0
            if prompt_len - hrows <= chunk:
                break
            free = [
                i
                for i, r in enumerate(self.slot_request)
                if r is None and i not in self._partials
            ]
            if not free:
                break
            worst_rows = min(
                self.config.seq_len, prompt_len + req.max_new_tokens + 1
            )
            need = -(-worst_rows // self.page_size)
            if need > self.allocator.free_pages:
                # Backpressure (FCFS: never skip past the head).  If nothing
                # holds pages and it still doesn't fit, it never will.
                if (
                    self.active_count == 0
                    and self._inflight is None
                    and not self._partials
                ):
                    raise RuntimeError(
                        f"request {req.request_id} needs more KV pages than "
                        f"the pool holds ({self.allocator.n_pages}); raise "
                        "n_pages or lower max_new_tokens"
                    )
                break
            slot = free[0]
            self.queue.pop(0)
            if hpages:
                # Pin the matched chain before allocating on top of it.
                self.allocator.adopt(slot, hpages)
                self._prefix_hits += 1
                self._prefix_rows_reused += hrows
            self.allocator.ensure_capacity(slot, worst_rows, self.page_size)
            self._partials[slot] = {"req": req, "done": hrows, "plen": prompt_len}
            started += 1
        if not self._partials:
            return fresh, started
        # One chunk per partial per step; same-phase partials batch into one
        # wave (intermediate chunks share the ``chunk`` window; final chunks
        # group by their suffix bucket).
        inter = [
            s for s, p in self._partials.items() if p["plen"] - p["done"] > chunk
        ]
        final = [
            s for s, p in self._partials.items() if p["plen"] - p["done"] <= chunk
        ]
        if inter:
            self._partial_wave(
                sorted(inter), chunk, final=False, fresh=fresh,
                pending=pending, spec_state=spec_state, emitted=emitted,
            )
        by_bucket: dict[int, list[int]] = {}
        for s in final:
            rem = self._partials[s]["plen"] - self._partials[s]["done"]
            b = max(rem, min(self._bucket(rem), self.config.seq_len))
            by_bucket.setdefault(b, []).append(s)
        for b, slots in sorted(by_bucket.items()):
            fresh = self._partial_wave(
                sorted(slots), b, final=True, fresh=fresh,
                pending=pending, spec_state=spec_state, emitted=emitted,
            )
        return fresh, started

    def _partial_wave(
        self, slots, win, *, final, fresh, pending, spec_state, emitted
    ):
        """One batched continued-prefill wave over partial slots: window =
        ``win`` prompt rows per slot starting at each slot's done-rows
        offset."""
        k = len(slots)
        k_pad = self._pad_group(k)
        tokens = np.zeros((k_pad, win), np.int32)
        out_idx = np.zeros(k_pad, np.int32)
        pos0 = np.zeros(k_pad, np.int32)
        tables = np.zeros((k_pad, self.allocator.max_pages_per_slot), np.int32)
        for i, s in enumerate(slots):
            p = self._partials[s]
            req = p["req"]
            n = min(win, p["plen"] - p["done"])
            tokens[i, :n] = req.prompt_tokens[p["done"] : p["done"] + n]
            out_idx[i] = n - 1
            pos0[i] = p["done"]
            tables[i] = self.allocator.tables[s]
        self._partial_waves += 1
        if not final:
            # Cache writes only; the logits row is dead and never fetched.
            _, self.cache = self._prefill_paged_cont(
                self.weights,
                jnp.asarray(tokens),
                self.cache,
                jnp.asarray(out_idx),
                jnp.asarray(tables),
                jnp.asarray(pos0),
            )
            for i, s in enumerate(slots):
                self._partials[s]["done"] += int(out_idx[i]) + 1
            return fresh
        # Final chunk: sample the first token through the mode-appropriate
        # continued-admission path and activate the slot.
        picks = [
            (self._partials[s]["req"], self._partials[s]["plen"]) for s in slots
        ]
        for s in slots:
            del self._partials[s]
        if pending is not None:
            temps = np.zeros(k_pad, np.float32)
            topps = np.ones(k_pad, np.float32)
            for i, (req, _) in enumerate(picks):
                temps[i] = req.temperature
                topps[i] = req.topp
            assert fresh is not None
            slots_arr = np.full(k_pad, self.n_slots, np.int32)  # pad → drop
            slots_arr[:k] = slots
            self._key, sub = jax.random.split(self._key)
            if spec_state is not None:
                full_rows = np.zeros((k_pad, self.config.seq_len), np.int32)
                for i, (req, plen) in enumerate(picks):
                    full_rows[i, :plen] = req.prompt_tokens[:plen]
                toks, fresh, hist, hlen, self.cache = (
                    self._prefill_paged_sampled_spec_cont(
                        self.weights,
                        jnp.asarray(tokens),
                        self.cache,
                        jnp.asarray(out_idx),
                        jnp.asarray(tables),
                        jnp.asarray(pos0),
                        jnp.asarray(temps),
                        jnp.asarray(topps),
                        sub,
                        jnp.asarray(slots_arr),
                        jnp.asarray(fresh),
                        jnp.asarray(spec_state["hist"]),
                        jnp.asarray(spec_state["hlen"]),
                        jnp.asarray(full_rows),
                    )
                )
                spec_state["hist"] = hist
                spec_state["hlen"] = hlen
            else:
                toks, fresh, self.cache = self._prefill_paged_sampled_cont(
                    self.weights,
                    jnp.asarray(tokens),
                    self.cache,
                    jnp.asarray(out_idx),
                    jnp.asarray(tables),
                    jnp.asarray(pos0),
                    jnp.asarray(temps),
                    jnp.asarray(topps),
                    sub,
                    jnp.asarray(slots_arr),
                    jnp.asarray(fresh),
                )
            for i, (req, plen) in enumerate(picks):
                self._occupy(req, slots[i], plen)
            pending.append({"toks": toks, "picks": picks})
        else:
            logits, self.cache = self._prefill_paged_cont(
                self.weights,
                jnp.asarray(tokens),
                self.cache,
                jnp.asarray(out_idx),
                jnp.asarray(tables),
                jnp.asarray(pos0),
            )
            logits_np = np.asarray(logits[:k])
            for i, (req, plen) in enumerate(picks):
                self._occupy(req, slots[i], plen)
                self._first_token(req, req._sampler.sample(logits_np[i]), emitted)
        if self.prefix_cache:
            # Register only now that every prompt page's rows are written
            # (chunks dispatch across steps — registering at partial start
            # would let a concurrent admission adopt half-written pages).
            for i, (req, plen) in enumerate(picks):
                self.allocator.register_prefix(
                    slots[i], req.prompt_tokens[:plen], self.page_size
                )
        return fresh

    def _occupy(self, req: Request, slot: int, s_real: int) -> None:
        """Bind an admitted request to its slot (its first token may still be
        on device — see ``_process_admits``)."""
        req.state = RequestState.ACTIVE
        req.slot = slot
        req._next_pos = s_real
        self.slot_request[slot] = req
        self.slot_pos[slot] = s_real

    def _first_token(self, req: Request, first: int, emitted) -> None:
        req.first_token_time = time.perf_counter()
        if req.slot is not None:
            self.slot_token[req.slot] = first
        self._emit(req, first, emitted)

    def _activate(
        self, req: Request, slot: int, s_real: int, first: int, emitted
    ) -> None:
        self._occupy(req, slot, s_real)
        self._first_token(req, first, emitted)

    def _process_admits(self, entry: dict, emitted) -> None:
        """Fetch a deferred admission group's first tokens (the decode chunk
        consuming them was already dispatched) and emit them."""
        firsts = np.asarray(entry["toks"])
        for i, (req, _) in enumerate(entry["picks"]):
            self._first_token(req, int(firsts[i]), emitted)

    def _fresh_base(self, prev: Optional[dict]) -> np.ndarray:
        """Host-known starting tokens for the next chunk: -1 for slots that
        chain device-side from ``prev`` (same request still active there) or
        are empty; the last processed token otherwise (e.g., after a
        pipeline break)."""
        fresh = np.full(self.n_slots, -1, np.int32)
        for slot, r in enumerate(self.slot_request):
            if r is None:
                continue
            covered = (
                prev is not None
                and prev["active"][slot]
                and prev["reqs"][slot] is r
            )
            if not covered:
                fresh[slot] = self.slot_token[slot]
        return fresh

    def _decode_all(self, emitted, slots=None) -> None:
        """One plain single-token step.  ``slots`` restricts it to a subset
        (the speculative taper: end-near slots step here while the rest run
        spec chunks; the excluded slots' cache writes are masked off)."""
        include = lambda i: slots is None or i in slots
        active = np.array(
            [r is not None and include(i) for i, r in enumerate(self.slot_request)]
        )
        if self.kv_layout == "paged":
            logits, self.cache = self._decode_paged(
                self.weights,
                jnp.asarray(self.slot_token[:, None]),
                self.cache,
                jnp.asarray(self.slot_pos),
                jnp.asarray(active),
                jnp.asarray(self.allocator.tables),
            )
        else:
            logits, self.cache = self._decode(
                self.weights,
                jnp.asarray(self.slot_token[:, None]),
                self.cache,
                jnp.asarray(self.slot_pos),
                jnp.asarray(active),
            )
        logits_np = np.asarray(logits)
        self._decode_steps += 1
        for slot, req in enumerate(self.slot_request):
            if req is None or not include(slot):
                continue
            self._decode_tokens += 1
            self.slot_pos[slot] += 1
            if self.slot_pos[slot] >= self.config.seq_len:
                self._finish(req, "length")
                continue
            token = req._sampler.sample(logits_np[slot])
            self.slot_token[slot] = token
            self._emit(req, token, emitted)

    _SPEC_ROUND_BUCKETS = (16, 8, 4, 2, 1)

    def _spec_n_rounds(self, avail: int) -> int:
        """Largest round bucket that fits ``avail`` rounds (0 = none).
        warmup() compiles exactly the buckets this can select."""
        cap = min(avail, max(self.decode_chunk_steps, 1))
        return next((rb for rb in self._SPEC_ROUND_BUCKETS if rb <= cap), 0)

    def _spec_host_hist(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-slot token histories rebuilt from exact host request state
        (used when no chunk is in flight; otherwise hist chains on device).
        Each active row is prompt + generated — ending with the slot's
        pending input token, the drafting invariant."""
        t = self.config.seq_len
        hist = np.zeros((self.n_slots, t), np.int32)
        hlen = np.zeros(self.n_slots, np.int32)
        for slot, req in enumerate(self.slot_request):
            if req is None:
                continue
            # Same prompt truncation as admission (seq_len - 1) so the
            # rebuilt history matches what the model actually consumed.
            prompt = list(req.prompt_tokens[: self.config.seq_len - 1])
            h = (prompt + req.generated)[-t:]
            hist[slot, : len(h)] = h
            hlen[slot] = len(h)
        return hist, hlen

    def _dispatch_spec_chunk(self, prev, fresh, hist_in, hlen_in):
        """Dispatch one speculative chunk without waiting for the previous
        one (same pipelining contract as ``_dispatch_chunk``): chained slots
        take the previous chunk's device-resident last-token/position/history
        outputs; ``fresh >= 0`` slots start from host-known state.  Slots
        with fewer than k+1 context rows left are masked out rather than
        throttling the whole batch's round count — step() finishes them
        with plain one-token steps on exact state.  Returns None when no
        slot can run a round."""
        k = self.spec_k
        active = np.array(
            [
                r is not None
                and not self._provably_done(r, slot)
                and self.config.seq_len - int(self.slot_pos[slot]) >= k + 1
                for slot, r in enumerate(self.slot_request)
            ]
        )
        if not active.any():
            return None
        max_pos = int(self.slot_pos[active].max())
        n_rounds = self._spec_n_rounds((self.config.seq_len - max_pos) // (k + 1))
        if n_rounds == 0:
            return None
        reqs = list(self.slot_request)
        temps = np.array([r.temperature if r else 0.0 for r in reqs], np.float32)
        topps = np.array([r.topp if r else 1.0 for r in reqs], np.float32)
        zeros = jnp.zeros(self.n_slots, jnp.int32)
        prev_last = zeros if prev is None else prev["last"]
        prev_pos = zeros if prev is None else prev["pos"]
        self._key, sub = jax.random.split(self._key)
        toks, counts, last, pos, hist, hlen, self.cache = self._decode_spec_paged(
            self.weights,
            prev_last,
            jnp.asarray(fresh),
            jnp.asarray(self.slot_pos),  # exact for every fresh slot
            prev_pos,
            self.cache,
            jnp.asarray(active),
            jnp.asarray(temps),
            jnp.asarray(topps),
            sub,
            jnp.asarray(self.allocator.tables),
            jnp.asarray(hist_in),
            jnp.asarray(hlen_in),
            n_rounds,
            k,
        )
        # Host position becomes an UPPER BOUND until the chunk is processed
        # (per-round advance is acceptance-dependent, 1..k+1).
        self.slot_pos[active] += n_rounds * (k + 1)
        self._spec_pending_rounds[active] += n_rounds
        return {
            "toks": toks,
            "counts": counts,
            "last": last,
            "pos": pos,
            "hist": hist,
            "hlen": hlen,
            "n_rounds": n_rounds,
            "active": active,
            "reqs": reqs,
        }

    def _process_spec_chunk(self, chunk: dict, emitted) -> None:
        """Fetch + process one speculative chunk: emit each slot's accepted
        runs, then restore the exact host position (prompt + generated − 1
        pending input) plus the still-in-flight chunk's reservation."""
        toks_np = np.asarray(chunk["toks"])  # [n_rounds, B, k+1]
        counts_np = np.asarray(chunk["counts"])  # [n_rounds, B]
        n_rounds = chunk["n_rounds"]
        self._decode_steps += n_rounds
        for slot, req in enumerate(chunk["reqs"]):
            if req is None or req.state is not RequestState.ACTIVE:
                continue
            if not chunk["active"][slot]:
                continue  # masked at dispatch — no tokens in this chunk
            pos = req._next_pos + len(req.generated) - 1  # exact chunk start
            for r in range(n_rounds):
                for i in range(int(counts_np[r, slot])):
                    self._decode_tokens += 1
                    pos += 1
                    if pos >= self.config.seq_len:
                        # Same boundary semantics as the plain path
                        # (_process_chunk): the token produced from the last
                        # context row is discarded.
                        self._finish(req, "length")
                        break
                    token = int(toks_np[r, slot, i])
                    self.slot_token[slot] = token
                    self._emit(req, token, emitted)
                    if req.state is not RequestState.ACTIVE:
                        break
                if req.state is not RequestState.ACTIVE:
                    break
            if req.state is not RequestState.ACTIVE:
                continue
            self._spec_pending_rounds[slot] = max(
                0, self._spec_pending_rounds[slot] - n_rounds
            )
            exact = req._next_pos + len(req.generated) - 1
            inflight = self._inflight
            reserved = (
                inflight["n_rounds"] * (self.spec_k + 1)
                if (
                    inflight is not None
                    and "hist" in inflight
                    and inflight["active"][slot]
                    and inflight["reqs"][slot] is req
                )
                else 0
            )
            self.slot_pos[slot] = exact + reserved
        # Acceptance EWMA → adaptive disable (__init__ spec_min_accept):
        # mean accepted tokens per round across this chunk's live slots.
        act_slots = [
            s
            for s, r in enumerate(chunk["reqs"])
            if r is not None and chunk["active"][s]
        ]
        if act_slots and n_rounds:
            mean_tok = float(counts_np[:, act_slots].mean())
            w = 0.2
            self._spec_chunks_seen += 1
            self._spec_accept_ewma = (
                mean_tok
                if self._spec_accept_ewma is None
                else (1 - w) * self._spec_accept_ewma + w * mean_tok
            )
            # Fast path: EWMA ≤ ~1.0 after two chunks means NOT ONE draft
            # accepted anywhere — cold histories show partial acceptance
            # when any exists (measured: constant streams hit mean 2.4 in
            # their first chunk), so zero is unambiguous and the full
            # grace would just burn more unaccepted rounds.
            zero_accept = (
                self._spec_chunks_seen >= 2 and self._spec_accept_ewma <= 1.05
            )
            if (
                self._spec_enabled
                and (zero_accept or self._spec_chunks_seen >= self._SPEC_GRACE_CHUNKS)
                and self._spec_accept_ewma < self.spec_min_accept
            ):
                self._spec_enabled = False
                self._spec_plain_chunks = 0
                if self._spec_chunks_seen <= self._SPEC_GRACE_CHUNKS + 2:
                    # The (re)probe died right at the grace boundary —
                    # acceptance hasn't appeared; back off the next probe.
                    self._spec_probe_interval = min(
                        self._spec_probe_interval * 2, 1024
                    )
                else:
                    # Speculation ran productively for a while before the
                    # EWMA sank: traffic changed — reset the backoff.
                    self._spec_probe_interval = self.spec_probe_chunks

    _SPEC_GATE_WINDOW = 64
    _SPEC_GATE_RECHECK = 4
    _SPEC_GATE_MAX_HOLDS = 16

    def _traffic_repetitive(self) -> bool:
        """Host-side gate for speculative re-probes: True iff some live
        stream's recent window (prompt tail + generated) repeats a bigram.
        The bigram drafter predicts the token that followed the most recent
        earlier occurrence of the current token-pair, so a window with no
        repeated bigram yields zero draftable continuations — a probe there
        is guaranteed to measure zero acceptance and just pays the grace
        chunks of unaccepted rounds.  O(window) per live slot (tails are
        sliced BEFORE concatenating — long contexts must not materialize
        full token lists on the scheduling hot path), evaluated every
        _SPEC_GATE_RECHECK chunks once the probe interval elapses.  The
        window cannot see repetition cycles longer than itself; the
        _SPEC_GATE_MAX_HOLDS escape at the call site covers that blind
        spot."""
        w = self._SPEC_GATE_WINDOW
        for r in self.slot_request:
            if r is None:
                continue
            seq = (list(r.prompt_tokens[-w:]) + list(r.generated[-w:]))[-w:]
            seen = set()
            for pair in zip(seq, seq[1:]):
                if pair in seen:
                    return True
                seen.add(pair)
        return False

    def _provably_done(self, r: Request, slot: int) -> bool:
        """True iff the request is certain to be finished by the tokens
        already dispatched (processed + in flight): it reaches
        max_new_tokens or the context end.  ``slot_pos`` is the dispatch-time
        position, so ``slot_pos - (prompt_end + processed)`` counts the
        still-unfetched tokens (a pending admission's device-side first token
        included).  EOS can only finish a request *earlier*, so a True here
        is exact — such a slot never has more work."""
        if self.spec_k and (
            self._spec_enabled or int(self._spec_pending_rounds[slot]) > 0
        ):
            # Speculative chunks advance 1..k+1 per round, so the position
            # delta is an upper bound; the GUARANTEED pending emission is one
            # token per dispatched-unprocessed round (plus a deferred
            # admission's first token).  No context-end clause: the rounds
            # bound keeps positions inside seq_len, and the taper finishes
            # through the plain-step fallback with exact state.  While the
            # acceptance-adaptive policy has speculation disabled (and no
            # spec rounds outstanding), positions are exact — fall through
            # to the plain formula, which the plain chunk path's masking
            # and n_steps bound rely on.
            pend = int(self._spec_pending_rounds[slot]) + (
                1 if r.first_token_time is None else 0
            )
            return len(r.generated) + pend >= r.max_new_tokens
        pending = int(self.slot_pos[slot]) - (r._next_pos + len(r.generated) - 1)
        return (
            len(r.generated) + pending >= r.max_new_tokens
            or int(self.slot_pos[slot]) >= self.config.seq_len
        )

    def _all_live_finish_within(self, prev: Optional[dict]) -> bool:
        """True iff every live slot is certain to finish inside the
        still-unprocessed ``prev`` chunk — the next chunk would be all
        zombies, so the caller skips it."""
        if prev is None:
            return False
        live = [
            (slot, r) for slot, r in enumerate(self.slot_request) if r is not None
        ]
        return bool(live) and all(self._provably_done(r, s) for s, r in live)

    def _dispatch_chunk(self, prev: Optional[dict], fresh=None) -> dict:
        """Dispatch one device-sampled decode chunk WITHOUT waiting for the
        previous chunk's results.  Continuing slots' input tokens are the
        previous chunk's last samples, which stay device-resident; slots
        (re)admitted since the previous dispatch start from their host-known
        first token.

        Safety of pipelining past an unprocessed chunk: a request that
        turns out to have finished inside ``prev`` keeps decoding here as a
        zombie — its tokens are discarded at processing (the request is
        already DONE) and its cache writes touch only its own dead rows or
        the null page.  Page reuse is ordered: device programs execute in
        dispatch order, so a later admission's prefill overwrites any
        zombie writes to reallocated pages.
        """
        # Slots whose request provably finished inside still-unprocessed
        # chunks are masked out: they'd otherwise throttle n_steps for the
        # whole batch once one stream hits the context end (max_pos ==
        # seq_len → n_steps 1) and dispatch cache writes at pos >= seq_len.
        active = np.array(
            [
                r is not None and not self._provably_done(r, slot)
                for slot, r in enumerate(self.slot_request)
            ]
        )
        reqs = list(self.slot_request)
        if fresh is None:
            # Dense layout: admissions are synchronous, so every starting
            # token is host-known (``_fresh_base`` semantics inline).
            fresh = self._fresh_base(prev)
        # The chunk jits return their last sampled row separately — slicing
        # prev["toks"] here would be an eager op on a pending array, which
        # blocks until the in-flight chunk completes.
        prev_last = (
            jnp.zeros(self.n_slots, jnp.int32) if prev is None else prev["last"]
        )
        pos0 = self.slot_pos.copy()
        active_pos = pos0[active]
        max_pos = int(active_pos.max()) if active_pos.size else 0
        n_steps = max(1, min(self.decode_chunk_steps, self.config.seq_len - max_pos))
        temps = np.array(
            [r.temperature if r else 0.0 for r in reqs], np.float32
        )
        topps = np.array([r.topp if r else 1.0 for r in reqs], np.float32)
        self._key, sub = jax.random.split(self._key)
        args = (
            self.weights,
            prev_last,
            jnp.asarray(fresh),
            self.cache,
            jnp.asarray(pos0),
            jnp.asarray(active),
            jnp.asarray(temps),
            jnp.asarray(topps),
            sub,
        )
        if self.kv_layout == "paged":
            toks, last, self.cache = self._decode_chunked_paged(
                *args, jnp.asarray(self.allocator.tables), n_steps
            )
        else:
            toks, last, self.cache = self._decode_chunked(*args, n_steps)
        # Advance dispatch-time positions; host-visible request state catches
        # up when the chunk is processed.
        self.slot_pos[active] += n_steps
        return {
            "toks": toks,
            "last": last,
            "n_steps": n_steps,
            "pos0": pos0,
            "active": active,
            "reqs": reqs,
        }

    def _process_chunk(self, chunk: dict, emitted) -> None:
        """Fetch + process one chunk's results: EOS/length handled on the
        host (a slot's cache rows past its stopping point are never
        attended — see scatter semantics in models/qwen3.py)."""
        toks_np = np.asarray(chunk["toks"])  # [n_steps, B]
        n_steps = chunk["n_steps"]
        self._decode_steps += n_steps
        for slot, req in enumerate(chunk["reqs"]):
            if req is None or req.state is not RequestState.ACTIVE:
                continue  # empty at dispatch, or finished in an earlier chunk
            pos = int(chunk["pos0"][slot])
            for i in range(n_steps):
                self._decode_tokens += 1
                pos += 1
                if pos >= self.config.seq_len:
                    self._finish(req, "length")
                    break
                token = int(toks_np[i, slot])
                self.slot_token[slot] = token
                self._emit(req, token, emitted)
                if req.state == RequestState.DONE:
                    break

    def _emit(self, req: Request, token: int, emitted) -> None:
        if token in req.eos_token_ids:
            self._finish(req, "stop")
            return
        req.generated.append(token)
        emitted.append((req, token))
        if len(req.generated) >= req.max_new_tokens:
            self._finish(req, "length")

    def _finish(self, req: Request, reason: str) -> None:
        req.state = RequestState.DONE
        req.finish_time = time.perf_counter()
        req.finish_reason = reason
        if req.slot is not None:
            if self.allocator is not None:
                self.allocator.release(req.slot)
            self.slot_request[req.slot] = None
            self.slot_pos[req.slot] = 0
            self.slot_token[req.slot] = 0
            self._spec_pending_rounds[req.slot] = 0
            req.slot = None
        self.completed.append(req)

    # -------------------------------------------------------------- metrics
    def stats(self) -> dict:
        done = [r for r in self.completed if r.finish_time]
        ttfts = sorted(r.ttft for r in done if r.ttft is not None)
        return {
            "completed": len(done),
            "decode_steps": self._decode_steps,
            "decode_tokens": self._decode_tokens,
            "p50_ttft": ttfts[len(ttfts) // 2] if ttfts else None,
            "slot_utilization": (
                self._decode_tokens / (self._decode_steps * self.n_slots)
                if self._decode_steps
                else 0.0
            ),
            **(
                {
                    "spec_enabled": self._spec_enabled,
                    "spec_accept_ewma": self._spec_accept_ewma,
                    "spec_probes_gated": self._spec_probes_gated,
                }
                if self.spec_k
                else {}
            ),
            **(
                {
                    "kv_pages_total": self.allocator.n_pages - 1,
                    "kv_pages_free": self.allocator.free_pages,
                }
                if self.allocator is not None
                else {}
            ),
            **(
                {
                    "prefix_hits": self._prefix_hits,
                    "prefix_rows_reused": self._prefix_rows_reused,
                    "prefix_cached_pages": self.allocator.cached_pages,
                }
                if self.prefix_cache
                else {}
            ),
            **(
                {"prefill_waves": self._partial_waves}
                if self.prefill_chunk is not None
                else {}
            ),
        }
