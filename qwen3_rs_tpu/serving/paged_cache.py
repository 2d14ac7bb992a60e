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
    """Host-side free-list allocator + per-slot page tables.

    Page 0 is reserved as the null page: unused page-table entries point at
    it, so device-side gathers are always in bounds.
    """

    def __init__(self, n_pages: int, n_slots: int, max_pages_per_slot: int):
        if n_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self.n_pages = n_pages
        self.max_pages_per_slot = max_pages_per_slot
        self._free: list[int] = list(range(n_pages - 1, 0, -1))  # pop() → low ids first
        self.tables = np.zeros((n_slots, max_pages_per_slot), np.int32)
        self.used = np.zeros(n_slots, np.int32)  # pages held per slot

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_admit(self, n_tokens: int, page_size: int) -> bool:
        need = -(-max(n_tokens, 1) // page_size)
        return need <= len(self._free)

    def allocate(self, slot: int, n: int) -> list[int]:
        """Append ``n`` fresh pages to the slot's table."""
        if n > len(self._free):
            raise RuntimeError(
                f"page pool exhausted: need {n}, have {len(self._free)} free"
            )
        start = int(self.used[slot])
        if start + n > self.max_pages_per_slot:
            raise RuntimeError(f"slot {slot} exceeds max_pages_per_slot")
        pages = [self._free.pop() for _ in range(n)]
        self.tables[slot, start : start + n] = pages
        self.used[slot] += n
        return pages

    def ensure_capacity(self, slot: int, n_tokens: int, page_size: int) -> None:
        """Grow the slot's table to cover ``n_tokens`` rows."""
        need = -(-max(n_tokens, 1) // page_size)
        have = int(self.used[slot])
        if need > have:
            self.allocate(slot, need - have)

    def release(self, slot: int) -> None:
        held = self.tables[slot, : int(self.used[slot])]
        self._free.extend(int(p) for p in held if p != 0)
        self.tables[slot, :] = 0
        self.used[slot] = 0
