"""Prefix caching: shared-prompt KV-page reuse in the paged serving path."""

import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.serving import ContinuousBatchingEngine, Request
from qwen3_rs_tpu.serving.paged_cache import PageAllocator

PAGE = 8


class TestAllocatorPrefixOps:
    def _alloc(self, n_pages=12, n_slots=3):
        return PageAllocator(n_pages, n_slots, max_pages_per_slot=8)

    def test_register_then_match(self):
        a = self._alloc()
        prompt = list(range(20))  # 2 full pages (rows 0..15), partial third
        a.allocate(0, 3)
        assert a.register_prefix(0, prompt, PAGE) == 2
        pages, rows = a.match_prefix(prompt, PAGE)
        assert rows == 16
        assert pages == [int(a.tables[0, 0]), int(a.tables[0, 1])]
        # A diverging second page breaks the chain after one page.
        other = prompt[:8] + [99] * 12
        pages2, rows2 = a.match_prefix(other, PAGE)
        assert rows2 == 8 and pages2 == pages[:1]
        # At least one token must remain for the prefill window.
        exact = prompt[:17]  # 2 full pages + 1 token → both may match
        assert a.match_prefix(exact, PAGE)[1] == 16
        boundary = prompt[:16]  # page-aligned: only the first page may match
        assert a.match_prefix(boundary, PAGE)[1] == 8

    def test_adopt_refcounts_and_release_to_cache(self):
        a = self._alloc()
        prompt = list(range(20))
        a.allocate(0, 3)
        a.register_prefix(0, prompt, PAGE)
        shared, rows = a.match_prefix(prompt, PAGE)
        a.adopt(1, shared)
        assert all(a.refcount[p] == 2 for p in shared)
        free_before = a.free_pages
        a.release(0)  # shared pages stay pinned by slot 1; private page frees
        assert all(a.refcount[p] == 1 for p in shared)
        assert a.free_pages == free_before + 1
        a.release(1)  # now zero-ref: indexed pages park in the cached set
        assert a.cached_pages == 2
        assert a.match_prefix(prompt, PAGE)[1] == 16  # still adoptable
        # Re-adoption from the cached set pins them again.
        a.adopt(2, shared)
        assert a.cached_pages == 0
        a.release(2)

    def test_eviction_drops_index(self):
        a = self._alloc(n_pages=6)  # 5 usable
        prompt = list(range(20))
        a.allocate(0, 3)
        a.register_prefix(0, prompt, PAGE)
        a.release(0)  # 2 cached + 3 free... (3rd page unindexed → free)
        assert a.cached_pages == 2 and a.free_pages == 5
        # Allocating all 5 pages must evict the cached ones (LRU) and
        # invalidate their index entries.
        a.allocate(1, 5)
        assert a.cached_pages == 0
        assert a.match_prefix(prompt, PAGE)[1] == 0
        a.release(1)

    def test_exhaustion_counts_cached_as_allocatable(self):
        a = self._alloc(n_pages=4)  # 3 usable
        a.allocate(0, 3)
        a.register_prefix(0, list(range(30)), PAGE)
        a.release(0)
        assert a.can_admit(24, PAGE)  # 3 pages: 3 cached count as free
        with pytest.raises(RuntimeError, match="exhausted"):
            a.allocate(1, 4)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(33)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)
    return config, weights


def _run(setup, reqs, *, prefix_cache, sampling="host", n_slots=2, n_pages=None):
    config, weights = setup
    eng = ContinuousBatchingEngine(
        config=config, weights=weights, n_slots=n_slots, mode="fast",
        prefill_buckets=(8, 16), kv_layout="paged", page_size=PAGE,
        n_pages=n_pages, sampling=sampling, prefix_cache=prefix_cache,
    )
    for r in reqs:
        eng.submit(r)
    done = eng.run()
    return eng, {r.request_id: list(r.generated) for r in done}


def _reqs():
    base = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # 11 tokens: 1 full page
    return [
        Request(request_id=0, prompt_tokens=list(base), max_new_tokens=5),
        Request(request_id=1, prompt_tokens=list(base), max_new_tokens=5),
        Request(
            request_id=2,
            prompt_tokens=list(base) + [8, 9, 7, 9],
            max_new_tokens=4,
        ),
        Request(request_id=3, prompt_tokens=[7, 7, 7], max_new_tokens=3),
    ]


class TestPrefixCacheServing:
    def test_outputs_match_uncached(self, setup):
        """Greedy outputs with prefix caching are token-for-token the
        uncached scheduler's (n_slots=1 forces sequential admissions, so
        requests 1 and 2 adopt request 0's prompt page)."""
        _, ref = _run(setup, _reqs(), prefix_cache=False, n_slots=1)
        eng, out = _run(setup, _reqs(), prefix_cache=True, n_slots=1)
        assert out == ref
        st = eng.stats()
        assert st["prefix_hits"] == 2
        assert st["prefix_rows_reused"] == 2 * PAGE
        # Finished requests park their indexed prompt pages for reuse.
        assert st["prefix_cached_pages"] >= 1

    def test_outputs_match_uncached_device_sampling(self, setup):
        _, ref = _run(setup, _reqs(), prefix_cache=False, n_slots=1,
                      sampling="device")
        eng, out = _run(setup, _reqs(), prefix_cache=True, n_slots=1,
                        sampling="device")
        assert out == ref
        assert eng.stats()["prefix_hits"] == 2

    def test_same_group_no_self_hit_but_correct(self, setup):
        """Two identical prompts admitted in ONE group can't hit (matching
        precedes the group's own registration) but must both be correct and
        register only one chain."""
        reqs = _reqs()[:2]
        _, ref = _run(setup, reqs, prefix_cache=False, n_slots=2)
        eng, out = _run(setup, _reqs()[:2], prefix_cache=True, n_slots=2)
        assert out == ref
        assert eng.stats()["prefix_hits"] == 0
        assert len(eng.allocator._index) == 1

    def test_pages_freed_and_pool_accounting(self, setup):
        eng, _ = _run(setup, _reqs(), prefix_cache=True, n_slots=1)
        a = eng.allocator
        # Everything released: free list + cached set must cover the pool.
        assert a.free_pages == a.n_pages - 1
        assert (a.refcount[1:] == 0).all()
        assert (a.used == 0).all()

    def test_eviction_under_pressure_still_correct(self, setup):
        """A pool barely larger than one request's worst case forces the
        cached prefix pages to be evicted between admissions — outputs must
        still match (the later requests just miss)."""
        _, ref = _run(setup, _reqs(), prefix_cache=False, n_slots=1, n_pages=6)
        eng, out = _run(setup, _reqs(), prefix_cache=True, n_slots=1, n_pages=6)
        assert out == ref

    def test_validation(self, setup):
        config, weights = setup
        with pytest.raises(ValueError, match="paged"):
            ContinuousBatchingEngine(
                config=config, weights=weights, kv_layout="dense",
                prefix_cache=True,
            )

    def test_composes_with_speculative(self, setup):
        """Prefix caching under speculative serving: greedy outputs match
        the plain (non-spec, non-cached) scheduler, prefixes hit, and the
        adopted prefix is draftable (history seeded from the full prompt)."""
        config, weights = setup
        base = [3, 1, 4, 1, 5, 9, 2, 6] * 2  # 16 tokens = 2 full pages
        reqs = lambda: [
            Request(request_id=i, prompt_tokens=list(base) + [10 + i],
                    max_new_tokens=6)
            for i in range(3)
        ]
        _, ref = _run(setup, reqs(), prefix_cache=False, n_slots=1)

        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=1, mode="fast",
            prefill_buckets=(8, 16), kv_layout="paged", page_size=PAGE,
            sampling="device", spec_k=2, prefix_cache=True,
        )
        for r in reqs():
            eng.submit(r)
        done = eng.run()
        out = {r.request_id: list(r.generated) for r in done}
        assert out == ref
        st = eng.stats()
        assert st["prefix_hits"] == 2
        assert st["prefix_rows_reused"] == 2 * 2 * PAGE
