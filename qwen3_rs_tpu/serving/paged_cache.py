"""Paged KV cache: a fixed page pool + per-slot page tables.

The reference preallocates one dense f32 cache of the full context window
(qwen3-inference/src/models/qwen3.rs:439-440) for its single request.  The
slot-dense serving cache here (scheduler.py) generalizes that to B slots —
but still reserves ``seq_len`` rows per slot, which at 8B/4k context costs
more HBM than the weights themselves.  This module provides the TPU-native
paged alternative (SURVEY §2.4: "paged KV cache, sharded over ICI, with
continuous batching"):

* one **page pool** per layer: ``[L, P, n_kv, page_size, head_dim]`` —
  static shape, jit-friendly, shardable over the tp axis on ``n_kv`` like
  the dense cache;
* a host-side **allocator** hands pages to requests on demand (prefill
  allocates ``ceil(prompt/page)`` up front, decode allocates one page each
  time a slot crosses a page boundary) and reclaims them when the request
  finishes — so resident KV memory tracks *actual* tokens, not
  ``n_slots × seq_len``;
* the device sees only a ``[B, max_pages]`` int32 **page table** per step.
  Attention runs the same position-bounded online-softmax loop as the dense
  path (ops/attention.py), with each key chunk gathered from the pool by
  page id; cache writes scatter each slot's new row into
  ``page_table[b, pos // page], row pos % page``.

Page size is a multiple of 128 so gathered chunks stay MXU/DMA friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration import ModelConfig


class PagedKVCache(NamedTuple):
    """Device half of the paged cache (a pytree; host bookkeeping lives in
    :class:`PageAllocator`)."""

    k: jax.Array  # [L, P, n_kv, page, hd]
    v: jax.Array  # [L, P, n_kv, page, hd]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]


class QuantizedPagedKVCache(NamedTuple):
    """INT8 page pool: codes + one symmetric scale per cached row per head.

    Halves KV HBM traffic and doubles pool capacity vs the bf16 pool (the
    KV-cache-quantization line of work, e.g. arXiv:2409.16997 /
    2601.04719); attention dequantizes gathered pages in registers.  Rows
    are quantized at write time with per-(position, head) scales — no
    calibration pass."""

    k: jax.Array  # int8 [L, P, n_kv, page, hd]
    v: jax.Array  # int8 [L, P, n_kv, page, hd]
    k_scale: jax.Array  # f32 [L, P, n_kv, page]
    v_scale: jax.Array  # f32 [L, P, n_kv, page]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]


def init_paged_cache(
    config: ModelConfig,
    n_pages: int,
    page_size: int = 128,
    dtype=jnp.bfloat16,
) -> PagedKVCache | QuantizedPagedKVCache:
    """``dtype="int8"`` (or jnp.int8) builds the quantized pool."""
    shape = (config.n_layers, n_pages, config.n_kv_heads, page_size, config.head_dim)
    if dtype == "int8" or dtype == jnp.int8:
        sshape = shape[:-1]
        return QuantizedPagedKVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(sshape, jnp.float32),
        )
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side free-list allocator + per-slot page tables, with
    refcounted **prefix caching** (the automatic-prefix-cache idea from the
    paged-attention line of work: requests sharing a prompt prefix share
    the KV pages that cover it).

    Page 0 is reserved as the null page: unused page-table entries point at
    it, so device-side gathers are always in bounds.

    Prefix caching machinery (all host-side, optional — unused unless the
    scheduler calls ``match_prefix``/``adopt``/``register_prefix``):

    * every page a request holds carries a refcount; a page shared by k
      requests frees only when the last one releases it;
    * an index maps the **chain hash** of the token prefix covered by each
      fully-written prompt page to that page id — position alignment is
      automatic because every chain starts at position 0, so equal chains
      imply bitwise-identical page content (same model, same tokens, same
      RoPE positions);
    * released-but-indexed pages park in an LRU **cached** set instead of
      the free list: still adoptable by a later prompt, reclaimed (and
      de-indexed) only when an allocation finds the free list empty.
    """

    def __init__(self, n_pages: int, n_slots: int, max_pages_per_slot: int):
        if n_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self.n_pages = n_pages
        self.max_pages_per_slot = max_pages_per_slot
        self._free: list[int] = list(range(n_pages - 1, 0, -1))  # pop() → low ids first
        self.tables = np.zeros((n_slots, max_pages_per_slot), np.int32)
        self.used = np.zeros(n_slots, np.int32)  # pages held per slot
        self.refcount = np.zeros(n_pages, np.int32)
        self._index: dict[int, int] = {}  # prefix chain-hash → page id
        self._page_key: dict[int, int] = {}  # page id → its chain-hash
        from collections import OrderedDict

        self._cached: "OrderedDict[int, None]" = OrderedDict()  # zero-ref, evictable

    @property
    def free_pages(self) -> int:
        """Allocatable pages: truly free + evictable cached."""
        return len(self._free) + len(self._cached)

    @property
    def cached_pages(self) -> int:
        return len(self._cached)

    def can_admit(self, n_tokens: int, page_size: int) -> bool:
        need = -(-max(n_tokens, 1) // page_size)
        return need <= self.free_pages

    def _take_free(self) -> int:
        if self._free:
            return self._free.pop()
        # Evict the least-recently-released cached page (drops its prefix
        # index entry; no live request references it by construction).
        pid, _ = self._cached.popitem(last=False)
        del self._index[self._page_key.pop(pid)]
        return pid

    def allocate(self, slot: int, n: int) -> list[int]:
        """Append ``n`` fresh (private, ref=1) pages to the slot's table."""
        if n > self.free_pages:
            raise RuntimeError(
                f"page pool exhausted: need {n}, have {self.free_pages} free"
            )
        start = int(self.used[slot])
        if start + n > self.max_pages_per_slot:
            raise RuntimeError(f"slot {slot} exceeds max_pages_per_slot")
        pages = [self._take_free() for _ in range(n)]
        self.tables[slot, start : start + n] = pages
        self.used[slot] += n
        self.refcount[pages] = 1
        return pages

    def ensure_capacity(self, slot: int, n_tokens: int, page_size: int) -> None:
        """Grow the slot's table to cover ``n_tokens`` rows."""
        need = -(-max(n_tokens, 1) // page_size)
        have = int(self.used[slot])
        if need > have:
            self.allocate(slot, need - have)

    def release(self, slot: int) -> None:
        held = self.tables[slot, : int(self.used[slot])]
        for p in (int(x) for x in held):
            if p == 0:
                continue
            self.refcount[p] -= 1
            if self.refcount[p] > 0:
                continue
            if p in self._page_key:
                # Indexed prefix page: keep its content adoptable (LRU).
                self._cached[p] = None
                self._cached.move_to_end(p)
            else:
                self._free.append(p)
        self.tables[slot, :] = 0
        self.used[slot] = 0

    # --------------------------------------------------------- prefix cache
    @staticmethod
    def _chain(key: int, block) -> int:
        return hash((key,) + tuple(int(t) for t in block))

    def match_prefix(self, tokens, page_size: int) -> tuple[list[int], int]:
        """Longest indexed prefix of ``tokens`` in whole pages.

        Returns (page ids, rows covered).  At least one trailing token is
        always left unmatched so the admission prefill has a window to run
        (its last row produces the first-token logits)."""
        pages: list[int] = []
        key = 0
        max_full = (len(tokens) - 1) // page_size
        for j in range(max_full):
            key = self._chain(key, tokens[j * page_size : (j + 1) * page_size])
            pid = self._index.get(key)
            if pid is None:
                break
            pages.append(pid)
        return pages, len(pages) * page_size

    def adopt(self, slot: int, pages: list[int]) -> None:
        """Prepend shared prefix pages to a (fresh) slot's table, pinning
        them (ref++).  Must precede any ``allocate`` for the slot."""
        if int(self.used[slot]):
            raise RuntimeError("adopt() requires an empty slot table")
        if len(pages) > self.max_pages_per_slot:
            raise RuntimeError(f"slot {slot} exceeds max_pages_per_slot")
        for p in pages:
            if self.refcount[p] == 0:
                self._cached.pop(p)  # pinned again; stays indexed
            self.refcount[p] += 1
        self.tables[slot, : len(pages)] = pages
        self.used[slot] = len(pages)

    def register_prefix(self, slot: int, tokens, page_size: int) -> int:
        """Index the slot's fully-prompt-covered pages for future reuse.

        Called once per admission with the request's full prompt; pages the
        slot adopted are already indexed (their chain keys hit) and are
        skipped.  Only pages whose every row is a prompt token register —
        the trailing partial page keeps taking decode writes and can never
        be shared.  Returns the number of newly indexed pages."""
        key = 0
        fresh = 0
        n_full = min((len(tokens) - 1) // page_size, int(self.used[slot]))
        for j in range(n_full):
            key = self._chain(key, tokens[j * page_size : (j + 1) * page_size])
            if key in self._index:
                continue
            pid = int(self.tables[slot, j])
            if pid == 0 or pid in self._page_key:
                continue
            self._index[key] = pid
            self._page_key[pid] = key
            fresh += 1
        return fresh
