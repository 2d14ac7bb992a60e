"""Continuous batching scheduler tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.models.qwen3 import init_kv_cache, qwen3_forward
from qwen3_rs_tpu.serving import ContinuousBatchingEngine, Request, RequestState


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(33)
    config = TINY_CONFIG
    _, weights = make_weights(config, rng)
    return config, weights


@pytest.fixture
def engine(setup):
    config, weights = setup
    return ContinuousBatchingEngine(
        config=config, weights=weights, n_slots=4, mode="fast",
        prefill_buckets=(8, 16, 32),
    )


def _greedy_single(config, weights, prompt, n_tokens):
    """Single-request greedy baseline using the raw model functions."""
    import jax.numpy as jnp

    cache = init_kv_cache(config, 1, dtype=jnp.bfloat16)
    logits, cache = qwen3_forward(
        config,
        weights,
        jnp.asarray([prompt], jnp.int32),
        cache,
        jnp.zeros(1, jnp.int32),
        mode="fast",
    )
    out = []
    pos = len(prompt)
    for _ in range(n_tokens):
        token = int(np.argmax(np.asarray(logits)[0]))
        out.append(token)
        logits, cache = qwen3_forward(
            config,
            weights,
            jnp.asarray([[token]], jnp.int32),
            cache,
            jnp.asarray([pos], jnp.int32),
            mode="fast",
        )
        pos += 1
    return out


class TestScheduler:
    def test_single_request_matches_unbatched(self, setup, engine):
        config, weights = setup
        prompt = [3, 17, 42, 5]
        n = 6
        req = Request(request_id=0, prompt_tokens=prompt, max_new_tokens=n)
        engine.submit(req)
        done = engine.run()
        assert len(done) == 1
        assert done[0].state == RequestState.DONE
        expected = _greedy_single(config, weights, prompt, n)
        assert done[0].generated == expected

    def test_concurrent_requests_all_complete(self, engine):
        rng = np.random.default_rng(1)
        reqs = [
            Request(
                request_id=i,
                prompt_tokens=list(rng.integers(0, 90, rng.integers(2, 10))),
                max_new_tokens=5,
            )
            for i in range(7)  # more requests than slots
        ]
        for r in reqs:
            engine.submit(r)
        done = engine.run()
        assert len(done) == 7
        assert all(len(r.generated) == 5 for r in done)
        assert all(r.finish_reason == "length" for r in done)

    def test_burst_admission_fills_slots_before_decode(self, setup):
        """A burst of queued requests must all admit (up to the slot count)
        in the FIRST scheduler step — one-admission-per-chunk would add a
        decode chunk to every queued request's TTFT."""
        config, weights = setup
        engine = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=4, mode="fast",
            prefill_buckets=(8,),
        )
        for i in range(6):
            engine.submit(Request(request_id=i, prompt_tokens=[5, i + 1], max_new_tokens=3))
        engine.step()
        assert engine.active_count == 4  # all slots filled in one step
        assert len(engine.queue) == 2
        done = engine.run()
        assert len(done) == 6

    def test_interleaved_matches_solo(self, setup, engine):
        """Requests decoded concurrently must produce the same tokens as if
        run alone — slot isolation."""
        config, weights = setup
        prompts = [[3, 17, 42], [9, 2, 55, 8], [1, 64]]
        n = 4
        for i, p in enumerate(prompts):
            engine.submit(Request(request_id=i, prompt_tokens=p, max_new_tokens=n))
        done = {r.request_id: r for r in engine.run()}
        for i, p in enumerate(prompts):
            expected = _greedy_single(config, weights, p, n)
            assert done[i].generated == expected, f"request {i}"

    def test_slot_reuse_after_finish(self, setup):
        config, weights = setup
        engine = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=1, mode="fast",
            prefill_buckets=(8,),
        )
        for i in range(3):
            engine.submit(Request(request_id=i, prompt_tokens=[5, i + 1], max_new_tokens=3))
        done = engine.run()
        assert len(done) == 3
        # With one slot, requests are strictly sequential (FCFS).
        assert [r.request_id for r in done] == [0, 1, 2]

    def test_eos_stops(self, setup, engine):
        config, weights = setup
        prompt = [3, 17, 42, 5]
        solo = _greedy_single(config, weights, prompt, 1)
        req = Request(
            request_id=0,
            prompt_tokens=prompt,
            max_new_tokens=50,
            eos_token_ids=(solo[0],),  # first greedy token acts as EOS
        )
        engine.submit(req)
        done = engine.run()
        assert done[0].generated == []
        assert done[0].finish_reason == "stop"

    def test_stats(self, engine):
        engine.submit(Request(request_id=0, prompt_tokens=[1, 2], max_new_tokens=3))
        engine.run()
        s = engine.stats()
        assert s["completed"] == 1
        assert s["p50_ttft"] is not None
        assert 0 < s["slot_utilization"] <= 1.0

    def test_device_chunked_matches_host_greedy(self, setup):
        """Device-sampling chunked decode must match the host single-step
        path for greedy requests."""
        config, weights = setup
        prompts = [[3, 17, 42], [9, 2, 55, 8]]
        n = 6
        results = {}
        for sampling in ("host", "device"):
            engine = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,), sampling=sampling, decode_chunk_steps=3,
            )
            for i, p in enumerate(prompts):
                engine.submit(Request(request_id=i, prompt_tokens=p, max_new_tokens=n))
            results[sampling] = {r.request_id: r.generated for r in engine.run()}
        assert results["host"] == results["device"]

    def test_device_chunked_eos_and_slot_reuse(self, setup):
        config, weights = setup
        engine = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=1, mode="fast",
            prefill_buckets=(8,), sampling="device", decode_chunk_steps=4,
        )
        solo = _greedy_single(config, weights, [3, 17], 1)
        engine.submit(
            Request(request_id=0, prompt_tokens=[3, 17], max_new_tokens=50,
                    eos_token_ids=(solo[0],))
        )
        engine.submit(Request(request_id=1, prompt_tokens=[5, 9], max_new_tokens=3))
        done = {r.request_id: r for r in engine.run()}
        assert done[0].finish_reason == "stop"
        assert done[0].generated == []
        assert len(done[1].generated) == 3
        # Slot-1 result must be unaffected by slot reuse after request 0.
        expected = _greedy_single(config, weights, [5, 9], 3)
        assert done[1].generated == expected

    def test_pipelined_chunks_zombie_slot_isolation(self, setup):
        """Device mode pipelines chunks: a request that hits EOS mid-chunk
        keeps decoding as a zombie in the already-dispatched next chunk.
        Its tokens must be discarded and concurrent slots unaffected."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), sampling="device", decode_chunk_steps=2,
            kv_layout="paged", page_size=8,
        )
        solo_a = _greedy_single(config, weights, [3, 17], 3)
        # A stops at its 3rd token (mid-chunk); B runs much longer.  The
        # greedy stream may repeat tokens, so the expected output is the
        # prefix before the FIRST occurrence of the chosen EOS.
        eos_a = solo_a[2]
        expected_a = solo_a[: solo_a.index(eos_a)]
        eng.submit(Request(request_id=0, prompt_tokens=[3, 17], max_new_tokens=50,
                           eos_token_ids=(eos_a,)))
        eng.submit(Request(request_id=1, prompt_tokens=[5, 9, 4], max_new_tokens=9))
        stepped = 0
        while eng.has_work:
            eng.step()
            if eng._inflight is not None:
                stepped += 1
        assert stepped > 0, "pipelining never engaged"
        done = {r.request_id: r for r in eng.completed}
        assert done[0].finish_reason == "stop"
        assert done[0].generated == expected_a
        assert done[1].generated == _greedy_single(config, weights, [5, 9, 4], 9)
        # Zombie writes must not leak pages.
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1

    def test_seeded_sampling_reproducible(self, setup):
        config, weights = setup
        outs = []
        for _ in range(2):
            engine = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,),
            )
            engine.submit(
                Request(
                    request_id=0,
                    prompt_tokens=[3, 7],
                    max_new_tokens=5,
                    temperature=0.9,
                    topp=0.9,
                    seed=123,
                )
            )
            outs.append(engine.run()[0].generated)
        assert outs[0] == outs[1]


class TestWarmup:
    def test_warmup_then_serve_matches(self, setup):
        """warmup() must not perturb serving results."""
        config, weights = setup
        outs = []
        for warm in (False, True):
            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8, 16),
            )
            if warm:
                eng.warmup()
            eng.submit(Request(request_id=0, prompt_tokens=[1, 2, 3], max_new_tokens=6))
            eng.submit(Request(request_id=1, prompt_tokens=[4, 5], max_new_tokens=6))
            done = eng.run()
            outs.append({r.request_id: r.generated for r in done})
        assert outs[0] == outs[1]

    def test_warmup_device_sampling(self, setup):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), sampling="device",
        )
        eng.warmup()
        eng.submit(Request(request_id=0, prompt_tokens=[1, 2, 3], max_new_tokens=4))
        done = eng.run()
        assert len(done[0].generated) == 4


class TestPagedKV:
    def _run(self, setup, kv_layout, sampling="host", n_pages=None, reqs=None):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=3, mode="fast",
            prefill_buckets=(8, 16), kv_layout=kv_layout, page_size=8,
            n_pages=n_pages, sampling=sampling,
        )
        for r in reqs or [
            Request(request_id=0, prompt_tokens=[1, 2, 3], max_new_tokens=6),
            Request(request_id=1, prompt_tokens=[4, 5, 6, 7, 8], max_new_tokens=5),
            Request(request_id=2, prompt_tokens=[2], max_new_tokens=7),
            Request(request_id=3, prompt_tokens=[9, 1], max_new_tokens=4),
        ]:
            eng.submit(r)
        done = eng.run()
        return eng, {r.request_id: list(r.generated) for r in done}

    def test_paged_matches_dense_greedy(self, setup):
        _, dense = self._run(setup, "dense")
        _, paged = self._run(setup, "paged")
        assert dense == paged

    def test_paged_device_sampling_matches_dense(self, setup):
        _, dense = self._run(setup, "dense", sampling="device")
        _, paged = self._run(setup, "paged", sampling="device")
        assert dense == paged

    def test_pages_released(self, setup):
        eng, _ = self._run(setup, "paged")
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1
        assert (eng.allocator.tables == 0).all()

    def test_backpressure_small_pool(self, setup):
        """A pool too small for all slots at once must still finish every
        request via admission backpressure."""
        _, dense = self._run(setup, "dense")
        # Each request needs ceil((pad + max_new + 1)/8) <= 3 pages; a pool
        # of 5 usable pages forces requests to queue.
        eng, paged = self._run(setup, "paged", n_pages=6)
        assert dense == paged
        assert eng.allocator.free_pages == 5

    def test_pool_too_small_raises(self, setup):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8, n_pages=2,
        )
        eng.submit(Request(request_id=0, prompt_tokens=[1] * 7, max_new_tokens=30))
        with pytest.raises(RuntimeError, match="pool"):
            eng.run()

    def test_group_admission_single_prefill(self, setup):
        """A same-bucket burst must admit with ONE batched prefill call, not
        one per request (the weight stream amortizes over the group)."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=4, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
        )
        calls = []
        orig = eng._prefill_paged
        eng._prefill_paged = lambda *a: calls.append(a[1].shape) or orig(*a)
        for i in range(4):
            eng.submit(Request(request_id=i, prompt_tokens=[5, i + 1], max_new_tokens=3))
        eng.step()
        assert eng.active_count == 4
        assert calls == [(4, 8)]  # one batched prefill for the whole wave

    def test_group_admission_mixed_buckets_same_step(self, setup):
        """Requests in different prompt buckets admit as separate groups but
        still all within the first scheduler step."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=4, mode="fast",
            prefill_buckets=(4, 16), kv_layout="paged", page_size=8,
        )
        calls = []
        orig = eng._prefill_paged
        eng._prefill_paged = lambda *a: calls.append(a[1].shape) or orig(*a)
        eng.submit(Request(request_id=0, prompt_tokens=[1, 2], max_new_tokens=3))
        eng.submit(Request(request_id=1, prompt_tokens=[3, 4], max_new_tokens=3))
        eng.submit(Request(request_id=2, prompt_tokens=list(range(1, 11)), max_new_tokens=3))
        eng.step()
        assert eng.active_count == 3
        assert calls == [(2, 4), (1, 16)]
        done = eng.run()
        assert len(done) == 3
        for r in done:
            expected = _greedy_single(config, weights, r.prompt_tokens, 3)
            assert r.generated == expected, f"request {r.request_id}"

    def test_group_admission_respects_admission_cap(self, setup):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=4, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
            max_admissions_per_step=2,
        )
        for i in range(4):
            eng.submit(Request(request_id=i, prompt_tokens=[5, i + 1], max_new_tokens=3))
        eng.step()
        assert eng.active_count == 2
        assert len(eng.queue) == 2
        assert len(eng.run()) == 4

    def test_group_admission_device_sampling_greedy_matches(self, setup):
        """Device-mode first tokens are sampled on device; greedy requests
        must still match the host path exactly."""
        config, weights = setup
        results = {}
        for sampling in ("host", "device"):
            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=3, mode="fast",
                prefill_buckets=(8,), kv_layout="paged", page_size=8,
                sampling=sampling,
            )
            for i in range(3):
                eng.submit(
                    Request(request_id=i, prompt_tokens=[3, 7 + i, 2], max_new_tokens=4)
                )
            results[sampling] = {r.request_id: r.generated for r in eng.run()}
        assert results["host"] == results["device"]

    def test_context_exhausted_slot_does_not_throttle_chunks(self, setup):
        """A stream that hits the context end mid-pipeline must be masked
        out of subsequent dispatches — otherwise max_pos == seq_len would
        clamp every other stream to 1-token chunks."""
        config, weights = setup  # seq_len = 64

        def make(n_slots):
            return ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=n_slots, mode="fast",
                prefill_buckets=(8, 32), kv_layout="paged", page_size=8,
                n_pages=24, sampling="device", decode_chunk_steps=4,
            )

        # Solo baseline for B through the same engine path (the raw-model
        # greedy baseline drifts over 40 near-tie tokens at bf16).
        solo = make(1)
        solo.submit(Request(request_id=1, prompt_tokens=[5, 9, 4, 2],
                            max_new_tokens=40))
        solo_b = solo.run()[0].generated

        eng = make(2)
        n_steps_seen = []
        orig = eng._decode_chunked_paged
        def spy(*a):
            n_steps_seen.append(a[-1])
            return orig(*a)
        eng._decode_chunked_paged = spy
        # A runs to the context boundary (length-capped by seq_len).
        eng.submit(Request(request_id=0, prompt_tokens=list(range(1, 31)),
                           max_new_tokens=60))
        # B finishes by max_new well before the boundary.
        eng.submit(Request(request_id=1, prompt_tokens=[5, 9, 4, 2],
                           max_new_tokens=40))
        done = {r.request_id: r for r in eng.run()}
        assert done[0].finish_reason == "length"
        assert done[1].generated == solo_b
        # The exhausted slot must not pin later chunks at n_steps == 1.
        assert n_steps_seen.count(1) == 0, n_steps_seen

    def test_paged_device_sampling_reproducible(self, setup):
        """Same engine seed + same request stream → identical sampled
        outputs (jax PRNG path, incl. on-device first tokens)."""
        config, weights = setup
        outs = []
        for _ in range(2):
            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,), kv_layout="paged", page_size=8,
                sampling="device", seed=7,
            )
            for i in range(3):
                eng.submit(Request(request_id=i, prompt_tokens=[3, 5 + i],
                                   max_new_tokens=5, temperature=0.9, topp=0.85))
            outs.append({r.request_id: r.generated for r in eng.run()})
        assert outs[0] == outs[1]

    def test_group_admission_mixed_sampling_params(self, setup):
        """A group admission carries per-request temperature/top-p: a greedy
        request in the same wave as sampled ones must match its solo greedy
        output exactly."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=3, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
            sampling="device",
        )
        eng.submit(Request(request_id=0, prompt_tokens=[3, 17, 4], max_new_tokens=5,
                           temperature=0.0))
        eng.submit(Request(request_id=1, prompt_tokens=[9, 2], max_new_tokens=5,
                           temperature=1.3, topp=0.7))
        eng.submit(Request(request_id=2, prompt_tokens=[5, 5], max_new_tokens=5,
                           temperature=0.0))
        done = {r.request_id: r for r in eng.run()}
        for rid in (0, 2):
            expected = _greedy_single(config, weights, done[rid].prompt_tokens, 5)
            assert done[rid].generated == expected, f"request {rid}"

    def test_tp_sharded_engine_matches_unsharded(self, setup):
        """Serving on a tp=2 mesh (weights + page pool sharded on kv/out
        axes) must produce the same greedy tokens as the single-device
        engine."""
        import jax

        from qwen3_rs_tpu.parallel.mesh import create_mesh

        config, weights = setup
        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        mesh = create_mesh(tp=2, dp=1, devices=jax.devices()[:2])
        outs = {}
        for name, m in (("plain", None), ("tp2", mesh)):
            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,), kv_layout="paged", page_size=8,
                sampling="device", mesh=m,
            )
            for i in range(3):
                eng.submit(Request(request_id=i, prompt_tokens=[3, 7 + i],
                                   max_new_tokens=5))
            outs[name] = {r.request_id: r.generated for r in eng.run()}
        assert outs["plain"] == outs["tp2"]

    @pytest.mark.parametrize("tp", [2, 4])
    def test_tp_serving_runs_paged_kernel(self, tp, monkeypatch):
        """serve --tp dispatches the shard_map forward, where the paged
        flash decode kernel engages per shard (interpret mode here) — the
        r2 allow_paged_flash mesh gate is gone.  Greedy stream must match
        the plain single-device engine."""
        import functools

        import jax

        import qwen3_rs_tpu.ops.pallas as pallas_pkg
        import qwen3_rs_tpu.ops.pallas.paged_attention as pa
        import qwen3_rs_tpu.ops.pallas.qmatmul as qmm
        from qwen3_rs_tpu.configuration import ARCHITECTURE_QWEN3, ModelConfig
        from qwen3_rs_tpu.parallel.mesh import create_mesh
        from qwen3_rs_tpu.testing import random_weights

        if len(jax.devices()) < tp:
            pytest.skip(f"needs >= {tp} devices")
        # head_dim=128 + page_size=128: the paged decode kernel's gates.
        config = ModelConfig(
            architecture_id=ARCHITECTURE_QWEN3,
            dim=64, hidden_dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
            head_dim=128, seq_len=512, vocab_size=256, group_size=16,
            shared_classifier=True,
        ).validate()
        weights = random_weights(config)

        calls = {"decode": 0}
        orig_decode = pa.paged_gqa_decode_stacked

        def decode_interp(*a, **kw):
            calls["decode"] += 1
            return orig_decode(*a, interpret=True, **kw)

        window_interp = functools.partial(
            pa.paged_gqa_window_stacked, interpret=True
        )
        monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
        # Keep the matmul kernels out (slow in interpret mode; covered by
        # test_tp_shardmap) — only the paged attention kernels run.
        monkeypatch.setattr(qmm, "supports_shapes", lambda *a, **k: False)
        monkeypatch.setattr(qmm, "rows_supported", lambda *a, **k: False)
        monkeypatch.setattr(qmm, "fused_enabled", lambda: False)

        def run(mesh):
            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,), kv_layout="paged", page_size=128,
                n_pages=9, sampling="device", decode_chunk_steps=2, mesh=mesh,
            )
            for i in range(2):
                eng.submit(Request(request_id=i, prompt_tokens=[3, 7 + i],
                                   max_new_tokens=4))
            return {r.request_id: r.generated for r in eng.run()}

        monkeypatch.setattr(pa, "paged_gqa_decode_stacked", decode_interp)
        monkeypatch.setattr(pa, "paged_gqa_window_stacked", window_interp)

        mesh = create_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
        got = run(mesh)
        assert calls["decode"] > 0, "paged decode kernel never engaged under tp"

        calls["decode"] = 0
        want = run(None)
        assert calls["decode"] > 0
        assert got == want

    def test_tp_sharded_engine_rejects_dp(self, setup):
        import jax

        from qwen3_rs_tpu.parallel.mesh import create_mesh

        config, weights = setup
        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        mesh = create_mesh(tp=1, dp=2, devices=jax.devices()[:2])
        with pytest.raises(ValueError, match="dp replica"):
            ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                kv_layout="paged", page_size=8, mesh=mesh,
            )

    def test_int8_kv_pool_matches_bf16_greedy(self, setup):
        """The INT8 page pool (per-row scales, dequant after gather) must
        reproduce the bf16 pool's greedy tokens on short contexts — the
        per-row symmetric error is far below typical logit margins."""
        config, weights = setup
        outs = {}
        for dtype in ("bf16", "int8"):
            import jax.numpy as jnp

            eng = ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                prefill_buckets=(8,), kv_layout="paged", page_size=8,
                sampling="device",
                cache_dtype="int8" if dtype == "int8" else jnp.bfloat16,
            )
            for i in range(3):
                eng.submit(Request(request_id=i, prompt_tokens=[3, 7 + i, 2],
                                   max_new_tokens=6))
            outs[dtype] = {r.request_id: r.generated for r in eng.run()}
        assert outs["bf16"] == outs["int8"]

    def test_int8_kv_dense_rejected(self, setup):
        config, weights = setup
        with pytest.raises(ValueError, match="paged"):
            ContinuousBatchingEngine(
                config=config, weights=weights, n_slots=2, mode="fast",
                kv_layout="dense", cache_dtype="int8",
            )

    def test_paged_warmup(self, setup):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
        )
        eng.warmup()
        eng.submit(Request(request_id=0, prompt_tokens=[1, 2], max_new_tokens=4))
        done = eng.run()
        assert len(done[0].generated) == 4
        st = eng.stats()
        assert st["kv_pages_free"] == st["kv_pages_total"]


class TestSpeculativeServing:
    """Batched n-gram speculative decoding (spec_k > 0, pipelined)."""

    def _run(self, setup, spec_k, reqs=None, **kw):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=3, mode="fast",
            prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
            sampling="device", spec_k=spec_k, decode_chunk_steps=4, **kw,
        )
        for r in reqs or [
            Request(request_id=0, prompt_tokens=[1, 2, 1, 2, 1], max_new_tokens=9),
            Request(request_id=1, prompt_tokens=[4, 5, 6, 7, 8], max_new_tokens=6),
            Request(request_id=2, prompt_tokens=[2], max_new_tokens=7),
            Request(request_id=3, prompt_tokens=[9, 1, 9, 1], max_new_tokens=8),
        ]:
            eng.submit(r)
        done = eng.run()
        return eng, {r.request_id: list(r.generated) for r in done}

    @pytest.mark.parametrize("k", [2, 3])
    def test_greedy_complete(self, setup, k):
        """Every request completes its exact budget through the speculative
        scheduler.  Token-level acceptance logic is unit-tested with a
        mocked forward in test_speculative.py; token-STREAM equality
        assertions are deliberately absent — on a tiny random model the
        argmax margins are near ties, and ulp-level float variation across
        process contexts (observed even between identical in-process runs
        under pytest) flips them, so any bitwise stream comparison flakes.
        """
        _, a = self._run(setup, spec_k=k)
        assert {rid: len(v) for rid, v in a.items()} == {0: 9, 1: 6, 2: 7, 3: 8}

    def test_pages_released_and_lengths(self, setup):
        eng, out = self._run(setup, spec_k=2)
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1
        # no EOS ids configured -> every request runs to its budget
        assert {rid: len(v) for rid, v in out.items()} == {0: 9, 1: 6, 2: 7, 3: 8}

    def test_mixed_sampling_batch(self, setup):
        """temperature>0 slots ride along one-token-per-round; every stream
        completes its budget (see test_greedy_complete on why token-stream
        equality is not asserted)."""
        def reqs():
            return [
                Request(request_id=0, prompt_tokens=[1, 2, 1, 2], max_new_tokens=8),
                Request(request_id=1, prompt_tokens=[4, 5, 6], max_new_tokens=6,
                        temperature=0.9, topp=0.8, seed=7),
                Request(request_id=2, prompt_tokens=[3, 3, 3], max_new_tokens=7),
            ]

        _, a = self._run(setup, spec_k=3, reqs=reqs())
        assert {rid: len(v) for rid, v in a.items()} == {0: 8, 1: 6, 2: 7}

    def test_verify_rows_match_single_steps(self, setup):
        """Numerics: each verify-row's logits must match the one-token-step
        logits at the same position (tolerantly — the shapes differ)."""
        import jax

        config, weights = setup
        from qwen3_rs_tpu.models.qwen3 import qwen3_forward
        from qwen3_rs_tpu.serving.paged_cache import init_paged_cache

        cache = init_paged_cache(config, n_pages=8, page_size=8)
        tables = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0]], jnp.int32)
        prompt = jnp.asarray([[5, 3, 5, 3]], jnp.int32)
        logits_p, cache = qwen3_forward(
            config, weights, prompt, cache, jnp.zeros(1, jnp.int32),
            mode="fast", page_table=tables, fresh_prefill=True,
        )
        window = jnp.asarray([[7, 9, 2]], jnp.int32)
        all_logits, cache_w = qwen3_forward(
            config, weights, window, cache, jnp.asarray([4], jnp.int32),
            mode="fast", page_table=tables, return_all_logits=True,
        )
        cache_s = cache
        for i in range(3):
            logits_i, cache_s = qwen3_forward(
                config, weights, window[:, i : i + 1], cache_s,
                jnp.asarray([4 + i], jnp.int32), mode="fast", page_table=tables,
            )
            np.testing.assert_allclose(
                np.asarray(all_logits[0, i], np.float32),
                np.asarray(logits_i[0], np.float32),
                rtol=0.05, atol=0.05,
            )

    def test_adaptive_disable_falls_back_to_plain(self, setup):
        """With an unreachable acceptance threshold the engine must flip to
        plain chunks after the first processed spec chunk — every request
        still completes its exact budget through the drained-pipeline
        switch, and the policy state is visible in stats()."""
        eng, out = self._run(setup, spec_k=2, spec_min_accept=10.0,
                             spec_probe_chunks=10_000)
        assert {rid: len(v) for rid, v in out.items()} == {0: 9, 1: 6, 2: 7, 3: 8}
        st = eng.stats()
        assert st["spec_enabled"] is False
        assert st["spec_accept_ewma"] is not None
        assert st["spec_accept_ewma"] < 10.0
        # Pages fully released through the mixed spec→plain run.
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1

    def test_adaptive_probe_reenables(self, setup):
        """A tiny probe interval forces repeated disable→probe→disable
        cycles; completion and page accounting must survive the flips."""
        eng, out = self._run(setup, spec_k=2, spec_min_accept=10.0,
                             spec_probe_chunks=1)
        assert {rid: len(v) for rid, v in out.items()} == {0: 9, 1: 6, 2: 7, 3: 8}
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1
        assert eng.stats()["spec_accept_ewma"] is not None

    def test_probe_gate_detector(self, setup):
        """_traffic_repetitive: True iff some live stream's recent window
        repeats a bigram (the precondition for the bigram drafter to have
        anything to draft)."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=3, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
            sampling="device", spec_k=2, decode_chunk_steps=4,
        )
        def req(tokens, gen=()):
            r = Request(request_id=0, prompt_tokens=list(tokens))
            r.generated = list(gen)
            return r

        # No live streams → nothing to draft.
        eng.slot_request = [None, None, None]
        assert not eng._traffic_repetitive()
        # Distinct bigrams only.
        eng.slot_request = [req([1, 2, 3, 4, 5]), None, req([9, 8, 7])]
        assert not eng._traffic_repetitive()
        # A repeated bigram in one stream's prompt...
        eng.slot_request = [req([1, 2, 3, 4, 5]), req([5, 6, 5, 6]), None]
        assert eng._traffic_repetitive()
        # ...or spanning prompt tail + generated.
        eng.slot_request = [req([1, 2, 3], gen=[4, 1, 2]), None, None]
        assert eng._traffic_repetitive()
        # Repetition older than the window is invisible.
        w = eng._SPEC_GATE_WINDOW
        eng.slot_request = [req([7, 7, 7] + list(range(100, 100 + w))), None, None]
        assert not eng._traffic_repetitive()

    def test_probe_gate_holds_on_nonrepetitive_traffic(self, setup):
        """With an unreachable threshold and a 1-chunk probe interval, a
        gated probe must not break completion; the gated counter is
        reported in stats()."""
        reqs = [
            Request(request_id=0, prompt_tokens=[1, 2, 3], max_new_tokens=6),
            Request(request_id=1, prompt_tokens=[4, 5, 6, 7], max_new_tokens=5),
        ]
        eng, out = self._run(setup, spec_k=2, reqs=reqs,
                             spec_min_accept=10.0, spec_probe_chunks=1)
        assert {rid: len(v) for rid, v in out.items()} == {0: 6, 1: 5}
        st = eng.stats()
        assert "spec_probes_gated" in st and st["spec_probes_gated"] >= 0

    def test_adaptive_keeps_spec_on_high_acceptance(self, setup):
        """Cyclic prompts draft perfectly (bigram drafter); with the default
        threshold the engine should finish with speculation still on."""
        eng, out = self._run(setup, spec_k=2)
        assert {rid: len(v) for rid, v in out.items()} == {0: 9, 1: 6, 2: 7, 3: 8}
        st = eng.stats()
        if st["spec_accept_ewma"] is not None and st["spec_accept_ewma"] >= 2.5:
            assert st["spec_enabled"] is True

    def test_spec_requires_paged_device(self, setup):
        config, weights = setup
        with pytest.raises(ValueError, match="speculative serving"):
            ContinuousBatchingEngine(
                config=config, weights=weights, kv_layout="dense",
                sampling="device", spec_k=2,
            )
        with pytest.raises(ValueError, match="speculative serving"):
            ContinuousBatchingEngine(
                config=config, weights=weights, kv_layout="paged",
                sampling="host", spec_k=2,
            )

    def test_spec_warmup_then_run(self, setup):
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
            sampling="device", spec_k=2, decode_chunk_steps=4,
        )
        eng.warmup()
        eng.submit(Request(request_id=0, prompt_tokens=[1, 2, 1, 2], max_new_tokens=5))
        done = eng.run()
        assert len(done[0].generated) == 5


class TestSchedulerFuzz:
    """Randomized loads against structural invariants: every request
    completes exactly its budget (no EOS configured), pages fully return to
    the pool, and no request is starved — across plain and speculative
    paged scheduling with mixed sampling parameters."""

    @pytest.mark.parametrize("spec_k", [0, 3])
    @pytest.mark.parametrize("seed", [1, 2])
    def test_random_load(self, setup, spec_k, seed):
        config, weights = setup
        rng = np.random.default_rng(seed)
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=3, mode="fast",
            prefill_buckets=(8, 16), kv_layout="paged", page_size=8,
            sampling="device", spec_k=spec_k, decode_chunk_steps=3,
        )
        reqs = []
        for i in range(9):
            plen = int(rng.integers(1, 14))
            budget = int(rng.integers(1, 12))
            temp = float(rng.choice([0.0, 0.0, 0.8]))
            reqs.append(
                Request(
                    request_id=i,
                    prompt_tokens=rng.integers(1, config.vocab_size, plen).tolist(),
                    max_new_tokens=budget,
                    temperature=temp,
                    seed=i,
                )
            )
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        assert len(done) == len(reqs)
        for r in done:
            assert len(r.generated) == r.max_new_tokens, (
                r.request_id, len(r.generated), r.max_new_tokens, r.finish_reason
            )
            assert r.finish_reason == "length"
            assert all(0 <= t < config.vocab_size for t in r.generated)
        assert eng.allocator.free_pages == eng.allocator.n_pages - 1
        assert (eng.allocator.tables == 0).all()
        assert eng.slot_request == [None] * eng.n_slots


def test_spec_context_end_taper(setup):
    """One stream filling its context must not collapse the batch out of
    speculative mode, and must stop exactly at the boundary with the same
    discard semantics as the plain scheduler (the token produced from the
    last context row is dropped)."""
    config, weights = setup  # seq_len = 64
    eng = ContinuousBatchingEngine(
        config=config, weights=weights, n_slots=2, mode="fast",
        prefill_buckets=(8, 64), kv_layout="paged", page_size=8,
        sampling="device", spec_k=3, decode_chunk_steps=4,
        n_pages=32,
    )
    # Request 0: prompt pads to bucket 64 → truncated to seq_len-1 rows; it
    # can only emit until pos hits seq_len (length-finish at the boundary).
    eng.submit(Request(request_id=0, prompt_tokens=list(range(1, 60)),
                       max_new_tokens=50))
    eng.submit(Request(request_id=1, prompt_tokens=[5, 6, 5, 6],
                       max_new_tokens=12))
    done = eng.run()
    out = {r.request_id: r for r in done}
    # Stream 1 completes its full budget despite stream 0 hugging the end.
    assert len(out[1].generated) == 12
    assert out[1].finish_reason == "length"
    # Stream 0: prompt consumes rows 0..58; the prefill's first token plus
    # decode tokens from input rows 59..62 emit, and the token produced
    # from the last row (63) is discarded (plain-path semantics):
    # generated = seq_len - prompt_len = 5.
    assert out[0].finish_reason == "length"
    assert len(out[0].generated) == config.seq_len - 59


class TestBucketLadder:
    def test_bucket_ladder_above_largest(self, setup):
        """Suffixes beyond the largest bucket pad to a geometric ladder of
        compiled widths (last bucket × 2^k, capped at seq_len) instead of
        one ragged shape per prompt length."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
        )
        assert eng._bucket(5) == 8
        assert eng._bucket(9) == 16
        assert eng._bucket(17) == 32
        assert eng._bucket(33) == min(64, config.seq_len)
        assert eng._bucket(10_000) == config.seq_len

    def test_long_prompt_beyond_bucket_matches_greedy(self, setup):
        """A prompt longer than every prefill bucket (paged, no
        prefill_chunk) admits through the padded ladder shape and decodes
        identically to the unbatched baseline."""
        config, weights = setup
        rng = np.random.default_rng(11)
        prompt = rng.integers(1, config.vocab_size, 19).tolist()  # > 16 = 2×8
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
        )
        eng.submit(Request(request_id=0, prompt_tokens=prompt,
                           max_new_tokens=6, temperature=0.0))
        done = eng.run()
        want = _greedy_single(config, weights, prompt, 6)
        got = [t for t in done[0].generated][:6]
        assert got == want[: len(got)]

    def test_warmup_covers_ladder(self, setup):
        """Every width _bucket can choose (up to the warmup cap) must be in
        the warmup list — a cold shape costs a mid-serving compile."""
        config, weights = setup
        eng = ContinuousBatchingEngine(
            config=config, weights=weights, n_slots=2, mode="fast",
            prefill_buckets=(8,), kv_layout="paged", page_size=8,
        )
        warm = set(eng._warm_buckets())
        for n in range(1, config.seq_len):
            assert eng._bucket(n) in warm, n
