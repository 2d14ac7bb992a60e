"""Chunked prefill: long prompts prefill ``prefill_chunk`` rows per
scheduler step (paged layout), interleaved with decode, with outputs
identical to the monolithic prefill in every sampling mode."""

import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.serving import ContinuousBatchingEngine, Request


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)
    return config, weights


def _engine(setup, **kw):
    config, weights = setup
    kw.setdefault("n_slots", 4)
    kw.setdefault("kv_layout", "paged")
    kw.setdefault("page_size", 8)
    kw.setdefault("n_pages", 40)
    kw.setdefault("prefill_buckets", (8, 16, 32))
    return ContinuousBatchingEngine(config=config, weights=weights, mode="fast", **kw)


def _run(engine, prompts, n=6, **req_kw):
    for i, p in enumerate(prompts):
        engine.submit(
            Request(request_id=i, prompt_tokens=list(p), max_new_tokens=n, **req_kw)
        )
    done = engine.run()
    return {r.request_id: r.generated for r in done}


def _prompts(rng, k, lo, hi):
    return [list(rng.integers(0, 90, int(rng.integers(lo, hi)))) for _ in range(k)]


class TestChunkedPrefill:
    def test_requires_paged_layout(self, setup):
        config, weights = setup
        with pytest.raises(ValueError):
            ContinuousBatchingEngine(
                config=config, weights=weights, kv_layout="dense", prefill_chunk=8
            )

    def test_long_prompt_matches_monolithic_host(self, setup):
        rng = np.random.default_rng(0)
        prompts = _prompts(rng, 3, 25, 40)  # several chunks each at chunk=8
        want = _run(_engine(setup), prompts)
        got_engine = _engine(setup, prefill_chunk=8)
        got = _run(got_engine, prompts)
        assert got == want
        assert got_engine.stats()["prefill_waves"] >= 3

    def test_device_sampling_greedy_matches_host(self, setup):
        rng = np.random.default_rng(1)
        prompts = _prompts(rng, 5, 20, 50)  # more requests than slots
        want = _run(_engine(setup), prompts)
        got = _run(_engine(setup, sampling="device", prefill_chunk=8), prompts)
        assert got == want

    def test_mixed_short_and_long(self, setup):
        rng = np.random.default_rng(2)
        prompts = _prompts(rng, 3, 2, 7) + _prompts(rng, 2, 30, 45)
        want = _run(_engine(setup), prompts)
        got = _run(_engine(setup, sampling="device", prefill_chunk=8), prompts)
        assert got == want

    def test_speculative_composes(self, setup):
        rng = np.random.default_rng(3)
        prompts = _prompts(rng, 3, 20, 40)
        want = _run(_engine(setup), prompts)
        got = _run(
            _engine(setup, sampling="device", spec_k=2, prefill_chunk=8), prompts
        )
        assert got == want

    def test_prefix_cache_composes(self, setup):
        # Sequential requests sharing a 16-row prefix; each suffix (20 rows)
        # still spans several chunks, so the SECOND request exercises the
        # partial path starting at done = matched rows.  (Registration
        # happens at the final wave, so the requests must not be admitted
        # concurrently — same semantics as monolithic group admission.)
        rng = np.random.default_rng(4)
        shared = list(rng.integers(0, 90, 16))
        tails = [list(rng.integers(0, 90, 20)) for _ in range(2)]
        prompts = [shared + t for t in tails]
        want = [_run(_engine(setup), [p])[0] for p in prompts]
        eng = _engine(setup, prefix_cache=True, prefill_chunk=8)
        got = []
        for i, p in enumerate(prompts):
            eng.submit(
                Request(request_id=i, prompt_tokens=list(p), max_new_tokens=6)
            )
            while eng.has_work:
                eng.step()
            got.append(eng.completed[-1].generated)
        assert got == want
        # The second prompt adopts the first's registered prefix pages.
        assert eng.stats()["prefix_hits"] >= 1
        assert eng.stats()["prefix_rows_reused"] >= 16

    def test_sampled_reproducible(self, setup):
        rng = np.random.default_rng(5)
        prompts = _prompts(rng, 3, 20, 40)
        kw = dict(temperature=0.8, topp=0.9, seed=11)
        a = _run(_engine(setup, prefill_chunk=8), prompts, **kw)
        b = _run(_engine(setup, prefill_chunk=8), prompts, **kw)
        assert a == b
        # And identical to the monolithic prefill: the sampler stream only
        # depends on per-request seeds, not on how the prompt was prefilled.
        c = _run(_engine(setup), prompts, **kw)
        assert a == c

    def test_warmup_covers_chunk_shapes(self, setup):
        eng = _engine(setup, sampling="device", prefill_chunk=8)
        eng.warmup()  # must not raise; compiles chunk + cont shapes
        rng = np.random.default_rng(6)
        got = _run(eng, _prompts(rng, 2, 20, 40))
        assert all(len(v) == 6 for v in got.values())

    def test_pool_exhaustion_with_cached_prefix_raises(self, setup):
        """Livelock regression (ADVICE r1): a head whose cached-prefix
        suffix fits one chunk but whose worst-case page need exceeds the
        pool must raise the pool-exhaustion error, not spin forever —
        _admit_group's raise-suppression must route by the same
        prefix-adjusted suffix _advance_partials uses."""
        eng = _engine(
            setup, prefix_cache=True, prefill_chunk=8, n_pages=6, n_slots=2
        )
        shared = list(range(1, 25))  # 24 rows = 3 full pages once cached
        eng.submit(
            Request(request_id=0, prompt_tokens=shared, max_new_tokens=2)
        )
        eng.run()
        # Same 24-row prefix (now cached) + short unique tail: suffix (4)
        # fits one chunk, but worst-case rows (24 + bucket + 500 + 1,
        # clamped to seq_len=64) need 8 pages > 6 in the pool.
        eng.submit(
            Request(
                request_id=1,
                prompt_tokens=shared + [30, 31, 32, 33],
                max_new_tokens=500,
            )
        )
        with pytest.raises(RuntimeError, match="KV pages"):
            eng.run()

    def test_max_admissions_caps_partial_starts(self, setup):
        """max_admissions_per_step bounds NEW chunked-prefill starts per
        step (ADVICE r1): 3 long prompts with budget 1 must not all start
        partial prefills in the first step."""
        eng = _engine(
            setup, prefill_chunk=8, max_admissions_per_step=1, n_slots=4
        )
        rng = np.random.default_rng(9)
        prompts = _prompts(rng, 3, 25, 40)  # all > chunk
        for i, p in enumerate(prompts):
            eng.submit(
                Request(request_id=i, prompt_tokens=list(p), max_new_tokens=4)
            )
        eng.step()
        assert len(eng._partials) == 1
        eng.step()
        assert len(eng._partials) == 2
        # And the run still completes correctly.
        got = {r.request_id: r.generated for r in (eng.run() or eng.completed)}
        want = _run(_engine(setup), [list(p) for p in prompts], n=4)
        assert got == want
