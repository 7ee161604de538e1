"""Paged-KV engine: exact equivalence with the contiguous slot engine +
page accounting behaviors."""

import numpy as np
import pytest

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.engine import (
    InferenceEngine,
    RequestParams,
)
from text_generation_inference_tpu.engine.paged_cache import PageAllocator
from text_generation_inference_tpu.engine.paged_engine import PagedInferenceEngine
from text_generation_inference_tpu.models import families
from tests import fixtures

PROMPTS = [
    [5, 9, 23, 77, 41],
    [100, 3, 250, 17, 88, 91, 12],
    [7, 7, 7],
]


def make_config(**kw):
    cfg = ServingConfig(
        max_sequence_length=64, max_new_tokens=32, max_batch_slots=3,
        prefill_buckets=[8, 16], kv_page_size=8, **kw)
    cfg.validate()
    return cfg


@pytest.fixture(scope="module")
def llama():
    return families.load_model(fixtures.tiny_llama(), dtype=jnp.float32)


def run_engine(engine, prompt, n_tokens, rp=None):
    slot = engine.acquire_slot()
    res = engine.prefill([slot], [prompt], [rp or RequestParams(max_new_tokens=n_tokens)])
    toks = [int(res.first_token.next_ids[0])]
    while len(toks) < n_tokens:
        for step in engine.decode_steps():
            toks.append(int(step.next_ids[slot]))
    engine.free(slot)
    return toks[:n_tokens]


class TestAllocator:
    def test_alloc_free_roundtrip(self):
        a = PageAllocator(num_pages=10, page_size=8, max_pages_per_slot=5)
        assert a.pages_needed(1) == 1
        assert a.pages_needed(8) == 1
        assert a.pages_needed(9) == 2
        p = a.allocate(0, 20)
        assert len(p) == 3 and a.num_free == 7
        a.free(0)
        assert a.num_free == 10

    def test_exhaustion(self):
        a = PageAllocator(num_pages=4, page_size=8, max_pages_per_slot=4)
        a.allocate(0, 24)
        assert not a.can_allocate(16)
        with pytest.raises(RuntimeError):
            a.allocate(1, 16)

    def test_per_slot_cap(self):
        a = PageAllocator(num_pages=100, page_size=8, max_pages_per_slot=2)
        assert not a.can_allocate(17)

    def test_row_indices(self):
        a = PageAllocator(num_pages=10, page_size=4, max_pages_per_slot=5)
        rows = a.row_indices([7, 2], length=6)
        np.testing.assert_array_equal(rows, [28, 29, 30, 31, 8, 9])


class TestPagedVsContiguous:
    def test_greedy_identical(self, llama):
        spec, params = llama
        plain = InferenceEngine(spec, params, make_config(), eos_token_id=2)
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=64)
        for prompt in PROMPTS:
            a = run_engine(plain, prompt, 12)
            b = run_engine(paged, prompt, 12)
            assert a == b, f"paged diverged for {prompt}"

    def test_sampling_identical(self, llama):
        spec, params = llama
        rp = RequestParams(temperature=0.9, top_p=0.9, seed=7,
                           max_new_tokens=10)
        plain = InferenceEngine(spec, params, make_config(), eos_token_id=2)
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=64)
        assert run_engine(plain, PROMPTS[0], 10, rp) == \
            run_engine(paged, PROMPTS[0], 10, rp)

    def test_concurrent_slots_page_isolation(self, llama):
        """Interleaved requests on disjoint page sets must not interfere."""
        spec, params = llama
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=64)
        iso = {i: run_engine(paged, p, 8) for i, p in enumerate(PROMPTS)}
        slots, outs = {}, {i: [] for i in range(len(PROMPTS))}
        for i, p in enumerate(PROMPTS):
            s = paged.acquire_slot()
            slots[i] = s
            res = paged.prefill([s], [p], [RequestParams(max_new_tokens=8)])
            outs[i].append(int(res.first_token.next_ids[0]))
        for _ in range(7):
            step = paged.decode_steps()[0]
            for i, s in slots.items():
                outs[i].append(int(step.next_ids[s]))
        for i in range(len(PROMPTS)):
            assert outs[i] == iso[i]
        # pages come back on free
        before = paged.allocator.num_free
        for s in slots.values():
            paged.free(s)
        assert paged.allocator.num_free > before

    def test_chunked_decode(self, llama):
        spec, params = llama
        paged1 = PagedInferenceEngine(spec, params, make_config(),
                                      eos_token_id=2, num_pages=64)
        paged4 = PagedInferenceEngine(spec, params,
                                      make_config(decode_chunk=4),
                                      eos_token_id=2, num_pages=64)
        assert run_engine(paged1, PROMPTS[1], 12) == \
            run_engine(paged4, PROMPTS[1], 12)

    def test_page_reuse_after_free(self, llama):
        """Freed pages reused by a new request must not leak stale KV."""
        spec, params = llama
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=16)
        baseline = run_engine(paged, PROMPTS[0], 8)
        run_engine(paged, PROMPTS[1], 8)   # churn the pool
        run_engine(paged, PROMPTS[2], 8)
        assert run_engine(paged, PROMPTS[0], 8) == baseline

    def test_inactive_slots_do_not_corrupt_live_pages(self, llama):
        """Inactive slots' stale/zero block tables must not be written
        through during decode.

        With a pool so small the live request is handed page 0 (the free
        list pops from the end, so page 0 goes out last), every inactive
        slot's all-zero block-table row points INTO the live request's
        allocation; if decode scatter-writes for inactive slots, the live
        request's historical KV is overwritten with garbage each step."""
        spec, params = llama
        plain = InferenceEngine(spec, params, make_config(), eos_token_id=2)
        expect = run_engine(plain, PROMPTS[1], 14)
        # 7 prompt + 14 new + 1 = 22 tokens -> exactly 3 pages of 8
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=3)
        assert run_engine(paged, PROMPTS[1], 14) == expect


class TestPagedRing:
    """Ring-buffer paged decode (decode_write_mode=ring, the chunked
    default): pool is read-only within a chunk, one block-table scatter
    per chunk (paged_core.decode_paged_ring_step / paged_ring_flush)."""

    def test_ring_matches_slot_engine_staggered(self, llama):
        spec, params = llama
        plain = InferenceEngine(spec, params, make_config(decode_chunk=4),
                                eos_token_id=2)
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=4),
                                     eos_token_id=2, num_pages=64)

        def staggered(engine):
            out = {}
            sa, sb = engine.acquire_slot(), engine.acquire_slot()
            res = engine.prefill(
                [sa, sb], [PROMPTS[0], PROMPTS[1]],
                [RequestParams(max_new_tokens=20)] * 2)
            out["a"] = [int(res.first_token.next_ids[0])]
            out["b"] = [int(res.first_token.next_ids[1])]
            for step in engine.decode_steps():
                out["a"].append(int(step.next_ids[sa]))
                out["b"].append(int(step.next_ids[sb]))
            engine.free(sb)
            sc = engine.acquire_slot()
            res = engine.prefill([sc], [PROMPTS[2]],
                                 [RequestParams(max_new_tokens=20)])
            out["c"] = [int(res.first_token.next_ids[0])]
            for _ in range(2):
                for step in engine.decode_steps():
                    out["a"].append(int(step.next_ids[sa]))
                    out["c"].append(int(step.next_ids[sc]))
            return out

        assert staggered(paged) == staggered(plain)

    def test_ring_inactive_slots_do_not_corrupt_live_pages(self, llama):
        """The chunk-end ring flush must drop inactive slots' writes —
        their block tables are stale (same hazard as the per-step path's
        inactive-write guard, but at flush granularity)."""
        spec, params = llama
        plain = InferenceEngine(spec, params, make_config(decode_chunk=4),
                                eos_token_id=2)
        expect = run_engine(plain, PROMPTS[1], 14)
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=4),
                                     eos_token_id=2, num_pages=3)
        assert run_engine(paged, PROMPTS[1], 14) == expect

    def test_ring_page_churn(self, llama):
        spec, params = llama
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=4),
                                     eos_token_id=2, num_pages=16)
        baseline = run_engine(paged, PROMPTS[0], 8)
        run_engine(paged, PROMPTS[1], 8)
        run_engine(paged, PROMPTS[2], 8)
        assert run_engine(paged, PROMPTS[0], 8) == baseline

    def test_no_details_variant_same_ids(self, llama):
        spec, params = llama
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=4),
                                     eos_token_id=2, num_pages=64)
        slot = paged.acquire_slot()
        res = paged.prefill([slot], [PROMPTS[0]],
                            [RequestParams(max_new_tokens=12)])
        with_details = [int(res.first_token.next_ids[0])]
        for step in paged.decode_steps(want_details=True):
            with_details.append(int(step.next_ids[slot]))
        paged.free(slot)

        slot = paged.acquire_slot()
        res = paged.prefill([slot], [PROMPTS[0]],
                            [RequestParams(max_new_tokens=12)])
        without = [int(res.first_token.next_ids[0])]
        for step in paged.decode_steps(want_details=False):
            without.append(int(step.next_ids[slot]))
            assert np.isnan(step.logprob[slot])
        paged.free(slot)
        assert with_details == without


class TestPagedParityFeatures:
    def test_prompt_details_match_slot_engine(self, llama):
        spec, params = llama
        plain = InferenceEngine(spec, params, make_config(), eos_token_id=2)
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=64)
        outs = {}
        for name, engine in (("plain", plain), ("paged", paged)):
            slot = engine.acquire_slot()
            res = engine.prefill([slot], [PROMPTS[1]],
                                 [RequestParams(max_new_tokens=4)],
                                 want_prompt_details=True)
            outs[name] = res.prompt_details[0]
            engine.free(slot)
        assert outs["paged"] is not None
        np.testing.assert_allclose(outs["paged"]["logprob"][1:],
                                   outs["plain"]["logprob"][1:],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(outs["paged"]["rank"],
                                      outs["plain"]["rank"])
        assert np.isnan(outs["paged"]["logprob"][0])

    def test_warmup_then_clean_generation(self, llama):
        spec, params = llama
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=2),
                                     eos_token_id=2, num_pages=64)
        paged.warmup()
        assert len(paged.free_slots) == paged.num_slots
        assert paged.allocator.num_free == 64
        fresh = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=2),
                                     eos_token_id=2, num_pages=64)
        assert run_engine(paged, PROMPTS[0], 8) == \
            run_engine(fresh, PROMPTS[0], 8)

    def test_reset_recovers(self, llama):
        spec, params = llama
        paged = PagedInferenceEngine(spec, params, make_config(),
                                     eos_token_id=2, num_pages=16)
        baseline = run_engine(paged, PROMPTS[0], 8)
        s = paged.acquire_slot()
        paged.prefill([s], [PROMPTS[1]], [RequestParams(max_new_tokens=4)])
        paged.reset()
        assert len(paged.free_slots) == paged.num_slots
        assert paged.allocator.num_free == 16
        assert run_engine(paged, PROMPTS[0], 8) == baseline


class TestLivePageBuckets:
    """The ring decode compiles per live-page bucket (powers of two) and
    must pick the smallest bucket covering every live context."""

    def test_bucket_pick_tracks_contexts(self, llama):
        spec, params = llama
        paged = PagedInferenceEngine(spec, params,
                                     make_config(decode_chunk=4),
                                     eos_token_id=2, num_pages=64)
        assert paged._page_bucket_grid() == [1, 2, 4, 8]
        assert paged._pick_live_pages() == 1          # empty engine
        slot = paged.acquire_slot()
        paged.prefill([slot], [PROMPTS[1]],
                      [RequestParams(max_new_tokens=30)])  # hist 8 -> 1 page
        assert paged._pick_live_pages() == 1
        paged.decode_steps()                          # hist 12 -> 2 pages
        assert paged._pick_live_pages() == 2
        for _ in range(2):
            paged.decode_steps()                      # hist 20 -> 4 pages
        assert paged._pick_live_pages() == 4
        paged.free(slot)
        paged.decode_steps()                          # drains the free
        assert paged._pick_live_pages() == 1

    def test_dense_gather_matches_kernel_path(self, llama):
        """Buckets within paged_gather_ctx_max run the dense-gather XLA
        attention; gather_ctx_max=0 forces the paged-kernel/merge path.
        Streams must be identical."""
        spec, params = llama
        dense = PagedInferenceEngine(
            spec, params, make_config(decode_chunk=4, paged_gather_ctx_max=64),
            eos_token_id=2, num_pages=64)
        kern = PagedInferenceEngine(
            spec, params, make_config(decode_chunk=4, paged_gather_ctx_max=0),
            eos_token_id=2, num_pages=64)
        assert run_engine(dense, PROMPTS[1], 16) == \
            run_engine(kern, PROMPTS[1], 16)

    def test_forced_buckets_agree(self, llama):
        spec, params = llama
        ref = PagedInferenceEngine(spec, params, make_config(decode_chunk=4),
                                   eos_token_id=2, num_pages=64)
        ref._warmup_pages = 8                         # always full table
        full = run_engine(ref, PROMPTS[0], 12)
        auto = PagedInferenceEngine(spec, params, make_config(decode_chunk=4),
                                    eos_token_id=2, num_pages=64)
        assert run_engine(auto, PROMPTS[0], 12) == full


class TestPagedInt8KVCache:
    """kv_cache_dtype=int8 on the paged engine (VERDICT r4 asked for the
    ring-chunk quantize-on-flush scheme ported to the page pool): scale
    pools ride the block table, quantization happens at prefill scatter +
    chunk flush, reads fold the scale into the score/value contractions.
    Mirrors tests/test_engine.py::TestInt8KVCache for the slot engine."""

    def _build(self, kv, chunk=4, gather_max=1024, num_pages=64):
        spec, params = families.load_model(fixtures.tiny_llama(),
                                           dtype=jnp.float32)
        cfg = make_config(decode_chunk=chunk, decode_write_mode="ring",
                          kv_cache_dtype=kv,
                          paged_gather_ctx_max=gather_max)
        return PagedInferenceEngine(spec, params, cfg, eos_token_id=2,
                                    num_pages=num_pages)

    def test_greedy_stream_matches_fp_dense_gather(self):
        fp = run_engine(self._build("auto"), PROMPTS[0], 24)
        q8 = run_engine(self._build("int8"), PROMPTS[0], 24)
        assert q8 == fp

    def test_greedy_stream_matches_fp_partial_path(self):
        """gather_ctx_max=0 forces the pool-partial path (the kernel
        regime), which for int8 folds scales in the gather-based partial
        reference."""
        fp = run_engine(self._build("auto", gather_max=0), PROMPTS[1], 16)
        q8 = run_engine(self._build("int8", gather_max=0), PROMPTS[1], 16)
        assert q8 == fp

    def test_multislot_staggered_with_frees(self):
        outs = []
        for kv in ("auto", "int8"):
            eng = self._build(kv)
            sa = eng.acquire_slot()
            ra = eng.prefill([sa], [PROMPTS[0]],
                             [RequestParams(max_new_tokens=20)])
            out_a = [int(ra.first_token.next_ids[0])]
            for step in eng.decode_steps():
                out_a.append(int(step.next_ids[sa]))
            sb = eng.acquire_slot()
            rb = eng.prefill([sb], [PROMPTS[1]],
                             [RequestParams(max_new_tokens=20)])
            out_b = [int(rb.first_token.next_ids[0])]
            for _ in range(2):
                for step in eng.decode_steps():
                    out_a.append(int(step.next_ids[sa]))
                    out_b.append(int(step.next_ids[sb]))
            eng.free(sa)          # page reuse after free
            sc = eng.acquire_slot()
            rc = eng.prefill([sc], [PROMPTS[2]],
                             [RequestParams(max_new_tokens=8)])
            out_c = [int(rc.first_token.next_ids[0])]
            for step in eng.decode_steps():
                out_b.append(int(step.next_ids[sb]))
                out_c.append(int(step.next_ids[sc]))
            outs.append((out_a, out_b, out_c))
        assert outs[0] == outs[1]

    def test_sampling_seeded_matches_fp(self):
        rp = RequestParams(temperature=0.8, top_k=10, seed=7,
                           max_new_tokens=16)
        fp = run_engine(self._build("auto"), PROMPTS[1], 16, rp=rp)
        q8 = run_engine(self._build("int8"), PROMPTS[1], 16, rp=rp)
        assert q8 == fp

    def test_requires_ring_chunk(self):
        spec, params = families.load_model(fixtures.tiny_llama(),
                                           dtype=jnp.float32)
        cfg = make_config(decode_chunk=1, kv_cache_dtype="int8")
        with pytest.raises(ValueError, match="ring"):
            PagedInferenceEngine(spec, params, cfg, eos_token_id=2,
                                 num_pages=64)
        cfg = make_config(decode_chunk=4, kv_cache_dtype="int8",
                          stream_decode_chunk=1)
        with pytest.raises(ValueError, match="stream_decode_chunk"):
            PagedInferenceEngine(spec, params, cfg, eos_token_id=2,
                                 num_pages=64)

    def test_warmup_and_reset(self):
        eng = self._build("int8", chunk=2)
        eng.warmup()
        assert len(eng.free_slots) == eng.num_slots
        fp = run_engine(self._build("auto", chunk=2), PROMPTS[2], 12)
        assert run_engine(eng, PROMPTS[2], 12) == fp
        eng.reset()
        assert run_engine(eng, PROMPTS[2], 12) == fp

    def test_speculative_rejects_int8(self):
        from text_generation_inference_tpu.engine.speculative import (
            PagedSpeculativeEngine)

        spec, params = families.load_model(fixtures.tiny_llama(),
                                           dtype=jnp.float32)
        cfg = make_config(decode_chunk=4, kv_cache_dtype="int8")
        with pytest.raises(ValueError, match="speculative"):
            PagedSpeculativeEngine(spec, params, cfg, eos_token_id=2,
                                   num_pages=64)
