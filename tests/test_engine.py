"""Engine-level tests: continuous-batching integrity on the slot model.

Ports the reference's batching-integrity invariants (reference:
scripts/batch_integrity_checks/batching_integrity_checks.py:97-153):
generation results must be identical whether a request runs alone or
interleaved with other requests being admitted/freed around it.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.engine import InferenceEngine, RequestParams
from text_generation_inference_tpu.models import families
from tests import fixtures


def make_engine(num_slots=4, max_seq=64):
    model_dir = fixtures.tiny_llama()
    spec, params = families.load_model(model_dir, dtype=jnp.float32)
    cfg = ServingConfig(
        max_sequence_length=max_seq, max_new_tokens=32,
        max_batch_slots=num_slots, prefill_buckets=[8, 16, 32],
    )
    cfg.validate()
    return InferenceEngine(spec, params, cfg, eos_token_id=2), spec, model_dir


def run_single(engine, prompt, n_tokens, rp=None):
    """Generate n_tokens greedily for one prompt, engine otherwise empty."""
    rp = rp or RequestParams()
    slot = engine.acquire_slot()
    res = engine.prefill([slot], [prompt], [rp])
    out = [int(res.first_token.next_ids[0])]
    for _ in range(n_tokens - 1):
        step = engine.decode()
        out.append(int(step.next_ids[slot]))
    engine.free(slot)
    return out


def hf_greedy(model_dir, prompt, n_tokens):
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=n_tokens, min_new_tokens=n_tokens,
            do_sample=False, num_beams=1)
    return out[0, len(prompt):].tolist()


PROMPTS = [
    [5, 9, 23, 77, 41],
    [100, 3, 250, 17, 88, 91, 12],
    [7, 7, 7],
    [42, 13, 99, 101, 55, 23, 81, 230, 11, 4],
]


class TestGreedyParity:
    def test_engine_matches_hf_generate(self):
        engine, spec, model_dir = make_engine()
        for prompt in PROMPTS[:2]:
            ours = run_single(engine, prompt, 12)
            ref = hf_greedy(model_dir, prompt, 12)
            assert ours == ref, f"prompt {prompt}: {ours} vs {ref}"


class TestBatchingIntegrity:
    def test_concurrent_equals_isolated(self):
        engine, spec, model_dir = make_engine(num_slots=4)
        isolated = {i: run_single(engine, p, 10) for i, p in enumerate(PROMPTS)}

        # admit all four concurrently
        slots = {}
        outs = {i: [] for i in range(len(PROMPTS))}
        for i, p in enumerate(PROMPTS):
            s = engine.acquire_slot()
            slots[i] = s
            res = engine.prefill([s], [p], [RequestParams()])
            outs[i].append(int(res.first_token.next_ids[0]))
        for _ in range(9):
            step = engine.decode()
            for i, s in slots.items():
                outs[i].append(int(step.next_ids[s]))
        for i in range(len(PROMPTS)):
            assert outs[i] == isolated[i], f"request {i} diverged under batching"
        for s in slots.values():
            engine.free(s)

    def test_staggered_admission_and_free(self):
        """Add-on prefills mid-decode must not perturb running requests."""
        engine, spec, model_dir = make_engine(num_slots=4)
        isolated = {i: run_single(engine, p, 10) for i, p in enumerate(PROMPTS)}

        s0 = engine.acquire_slot()
        r0 = engine.prefill([s0], [PROMPTS[0]], [RequestParams()])
        out0 = [int(r0.first_token.next_ids[0])]
        # 3 decode steps alone
        for _ in range(3):
            out0.append(int(engine.decode().next_ids[s0]))
        # admit request 1 mid-flight
        s1 = engine.acquire_slot()
        r1 = engine.prefill([s1], [PROMPTS[1]], [RequestParams()])
        out1 = [int(r1.first_token.next_ids[0])]
        # run both; free request 0 when it hits 10 tokens
        for _ in range(6):
            step = engine.decode()
            out0.append(int(step.next_ids[s0]))
            out1.append(int(step.next_ids[s1]))
        assert out0 == isolated[0]
        engine.free(s0)
        # admit request 2 into the freed... different slot
        s2 = engine.acquire_slot()
        r2 = engine.prefill([s2], [PROMPTS[2]], [RequestParams()])
        out2 = [int(r2.first_token.next_ids[0])]
        for _ in range(3):
            step = engine.decode()
            out1.append(int(step.next_ids[s1]))
            out2.append(int(step.next_ids[s2]))
        assert out1 == isolated[1]
        assert out2[:4] == isolated[2][:4]

    def test_slot_reuse_is_clean(self):
        """A freed slot reused by a new request must not leak prior state."""
        engine, spec, model_dir = make_engine(num_slots=2)
        baseline = run_single(engine, PROMPTS[2], 8)
        # occupy the specific slot with a different long request first
        slot = engine.acquire_slot()
        engine.prefill([slot], [PROMPTS[3]], [RequestParams(repetition_penalty=1.5,
                                                            temperature=0.9, seed=7)])
        for _ in range(5):
            engine.decode()
        engine.free(slot)
        again = run_single(engine, PROMPTS[2], 8)
        assert again == baseline


class TestSampling:
    def test_same_seed_reproducible_across_slots(self):
        engine, spec, model_dir = make_engine(num_slots=4)
        rp = RequestParams(temperature=0.8, top_p=0.9, seed=1234)
        a = run_single(engine, PROMPTS[0], 8, rp)
        # occupy a couple of slots so the request lands elsewhere
        s_a = engine.acquire_slot()
        s_b = engine.acquire_slot()
        engine.prefill([s_a], [PROMPTS[1]], [RequestParams()])
        b_slot = engine.acquire_slot()
        res = engine.prefill([b_slot], [PROMPTS[0]], [rp])
        b = [int(res.first_token.next_ids[0])]
        for _ in range(7):
            b.append(int(engine.decode().next_ids[b_slot]))
        assert a == b, "same seed must give same tokens regardless of slot/batch"

    def test_different_seeds_diverge(self):
        engine, spec, model_dir = make_engine()
        a = run_single(engine, PROMPTS[1], 10, RequestParams(temperature=1.5, seed=1))
        b = run_single(engine, PROMPTS[1], 10, RequestParams(temperature=1.5, seed=2))
        assert a != b

    def test_min_new_tokens_blocks_eos(self):
        engine, spec, model_dir = make_engine()
        rp = RequestParams(min_new_tokens=6)
        slot = engine.acquire_slot()
        res = engine.prefill([slot], [PROMPTS[0]], [rp])
        toks = [int(res.first_token.next_ids[0])]
        for _ in range(5):
            toks.append(int(engine.decode().next_ids[slot]))
        assert engine.eos_token_id not in toks[:6]


class TestChunkedDecode:
    def test_chunked_matches_unchunked(self):
        """decode_chunk > 1 must produce identical token streams."""
        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)

        def build(chunk):
            cfg = ServingConfig(
                max_sequence_length=64, max_new_tokens=32,
                max_batch_slots=2, prefill_buckets=[8, 16],
                decode_chunk=chunk)
            cfg.validate()
            return InferenceEngine(spec, params, cfg, eos_token_id=2)

        def run(engine, n_chunks):
            slot = engine.acquire_slot()
            res = engine.prefill([slot], [PROMPTS[0]], [RequestParams()])
            toks = [int(res.first_token.next_ids[0])]
            for _ in range(n_chunks):
                for step in engine.decode_steps():
                    toks.append(int(step.next_ids[slot]))
            return toks

        plain = run(build(1), 8)
        chunked = run(build(4), 2)
        assert plain == chunked

    def test_per_call_chunk_override_matches(self):
        """decode_steps(chunk=k) — the stream-aware small chunk — must
        produce the same token stream as the engine-default chunk, and
        emit exactly k steps per call."""
        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)

        def build():
            cfg = ServingConfig(
                max_sequence_length=64, max_new_tokens=32,
                max_batch_slots=2, prefill_buckets=[8, 16],
                decode_chunk=6, stream_decode_chunk=2)
            cfg.validate()
            return InferenceEngine(spec, params, cfg, eos_token_id=2)

        def run(engine, chunks):
            slot = engine.acquire_slot()
            res = engine.prefill([slot], [PROMPTS[0]], [RequestParams()])
            toks = [int(res.first_token.next_ids[0])]
            for c in chunks:
                steps = engine.decode_steps(chunk=c)
                assert len(steps) == (c or engine.decode_chunk)
                for step in steps:
                    toks.append(int(step.next_ids[slot]))
            return toks

        # 12 steps as two default chunks vs mixed small/default chunks
        ref = run(build(), [None, None])
        mixed = run(build(), [2, 2, 6, 2])
        assert ref == mixed


class TestMultiPrefill:
    def test_batched_prefill_matches_individual(self):
        engine, spec, model_dir = make_engine(num_slots=4)
        iso = {i: run_single(engine, p, 6) for i, p in enumerate(PROMPTS[:3])}
        slots = [engine.acquire_slot() for _ in range(3)]
        res = engine.prefill(
            slots, PROMPTS[:3], [RequestParams()] * 3)
        outs = {i: [int(res.first_token.next_ids[i])] for i in range(3)}
        for _ in range(5):
            step = engine.decode()
            for i, s in enumerate(slots):
                outs[i].append(int(step.next_ids[s]))
        for i in range(3):
            assert outs[i] == iso[i], f"batched prefill diverged for request {i}"


class TestWriteModeParity:
    """ring / post / scan KV-write strategies must produce identical
    streams, including across chunk boundaries, staggered admission/frees,
    and alibi position bias (bloom)."""

    def _build(self, model_dir, mode, chunk, dtype=jnp.float32):
        spec, params = families.load_model(model_dir, dtype=dtype)
        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=32, max_batch_slots=3,
            prefill_buckets=[8, 16], decode_chunk=chunk,
            decode_write_mode=mode)
        cfg.validate()
        return InferenceEngine(spec, params, cfg, eos_token_id=2)

    def _staggered_run(self, engine):
        """Admit A+B, decode a chunk, free B, admit C mid-stream, decode."""
        out = {}
        sa = engine.acquire_slot()
        sb = engine.acquire_slot()
        res = engine.prefill([sa, sb], [PROMPTS[0], PROMPTS[1]],
                             [RequestParams(), RequestParams()])
        out["a"] = [int(res.first_token.next_ids[0])]
        out["b"] = [int(res.first_token.next_ids[1])]
        for step in engine.decode_steps():
            out["a"].append(int(step.next_ids[sa]))
            out["b"].append(int(step.next_ids[sb]))
        engine.free(sb)
        sc = engine.acquire_slot()
        res = engine.prefill([sc], [PROMPTS[2]], [RequestParams()])
        out["c"] = [int(res.first_token.next_ids[0])]
        for _ in range(2):
            for step in engine.decode_steps():
                out["a"].append(int(step.next_ids[sa]))
                out["c"].append(int(step.next_ids[sc]))
        return out

    # tiny_mistral: sliding-window masking (window=8 < the streamed
    # context) must agree across all three KV-write paths; tiny_mpt: the
    # mpt-variant alibi slopes through the ring/scan decode formulations
    @pytest.mark.parametrize(
        "fixture", ["tiny_llama", "tiny_bloom", "tiny_mistral", "tiny_mpt"])
    def test_modes_agree(self, fixture):
        model_dir = getattr(fixtures, fixture)()
        ref = self._staggered_run(self._build(model_dir, "post", 4))
        for mode in ("ring", "scan"):
            got = self._staggered_run(self._build(model_dir, mode, 4))
            assert got == ref, f"{mode} diverged from post on {fixture}"


class TestCtxBuckets:
    """Ring decode with context buckets (cache READ sliced to the smallest
    bucket covering every live slot) must produce identical streams to the
    full-cache read, across bucket-crossing chunks, staggered admission,
    and frees."""

    def _build(self, model_dir, ctx_buckets, chunk=4):
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=32, max_batch_slots=3,
            prefill_buckets=[8, 16], decode_chunk=chunk,
            decode_write_mode="ring", decode_ctx_buckets=ctx_buckets)
        cfg.validate()
        return InferenceEngine(spec, params, cfg, eos_token_id=2)

    def _run(self, engine, n_chunks=6):
        """Two staggered requests; ctx crosses the 16-bucket mid-stream."""
        out = {}
        sa = engine.acquire_slot()
        res = engine.prefill([sa], [PROMPTS[0]], [RequestParams()])
        out["a"] = [int(res.first_token.next_ids[0])]
        for step in engine.decode_steps():
            out["a"].append(int(step.next_ids[sa]))
        sb = engine.acquire_slot()
        res = engine.prefill([sb], [PROMPTS[1]], [RequestParams()])
        out["b"] = [int(res.first_token.next_ids[0])]
        for _ in range(n_chunks):
            for step in engine.decode_steps():
                out["a"].append(int(step.next_ids[sa]))
                out["b"].append(int(step.next_ids[sb]))
        engine.free(sa)
        sc = engine.acquire_slot()
        res = engine.prefill([sc], [PROMPTS[2]], [RequestParams()])
        out["c"] = [int(res.first_token.next_ids[0])]
        for step in engine.decode_steps():
            out["b"].append(int(step.next_ids[sb]))
            out["c"].append(int(step.next_ids[sc]))
        return out

    def test_bucketed_matches_full(self):
        model_dir = fixtures.tiny_llama()
        ref = self._run(self._build(model_dir, [64]))
        got = self._run(self._build(model_dir, [8, 16, 32, 64]))
        assert got == ref

    def test_bucket_pick_tracks_live_contexts(self):
        model_dir = fixtures.tiny_llama()
        engine = self._build(model_dir, [8, 16, 32, 64])
        assert engine._pick_cache_rows() == 8          # empty engine
        sa = engine.acquire_slot()
        engine.prefill([sa], [PROMPTS[1]], [RequestParams()])  # len 7 -> hist 8
        assert engine._pick_cache_rows() == 8
        engine.decode_steps()                          # hist 8 -> 12
        assert engine._pick_cache_rows() == 16
        for _ in range(2):
            engine.decode_steps()                      # hist -> 20
        assert engine._pick_cache_rows() == 32
        engine.free(sa)
        engine.decode_steps()                          # drains the free
        assert engine._pick_cache_rows() == 8

    def test_precompile_covers_grid_without_touching_state(self):
        model_dir = fixtures.tiny_llama()
        engine = self._build(model_dir, [8, 16, 32, 64])
        before = np.asarray(engine.state.history_len)
        n = engine.precompile_decode()
        assert n == (2 * len(engine._ctx_bucket_grid())
                     * len(engine._chunk_grid()))
        assert set(engine._decode_fns) == {
            (d, b, c) for d in (False, True)
            for b in engine._ctx_bucket_grid()
            for c in engine._chunk_grid()}
        assert (np.asarray(engine.state.history_len) == before).all()
        # compiled programs must still produce the reference stream
        assert self._run(engine) == self._run(
            self._build(model_dir, [8, 16, 32, 64]))

    def test_default_ladder_caps_at_max_seq(self):
        cfg = ServingConfig(max_sequence_length=1024, max_new_tokens=512)
        cfg.validate()
        assert cfg.decode_ctx_buckets == [128, 256, 512, 1024]
        cfg2 = ServingConfig(max_sequence_length=64, max_new_tokens=32)
        cfg2.validate()
        assert cfg2.decode_ctx_buckets == [64]


class TestWarmupCoverage:
    """warmup() must pre-compile every (batch, bucket) prefill program the
    scheduler can emit — the reference probes exactly these boundary shapes
    (reference: utils/warmup.py:68-152). Round-2 gap: only batch size 1 was
    warmed, so the first concurrent burst compiled in the serving loop."""

    @pytest.mark.parametrize("paged", [False, True])
    def test_no_inloop_compiles_after_warmup(self, paged):
        import asyncio

        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.scheduler.batcher import Batcher
        from text_generation_inference_tpu.scheduler.request import (
            GenRequest, ResponseOptions, StoppingCriteria)

        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=16, max_batch_slots=4,
            max_prefill_batch=4, prefill_buckets=[8, 16], kv_page_size=8,
            max_waiting_tokens=2)
        cfg.validate()
        if paged:
            from text_generation_inference_tpu.engine.paged_engine import (
                PagedInferenceEngine)

            engine = PagedInferenceEngine(spec, params, cfg, eos_token_id=2,
                                          num_pages=64)
        else:
            engine = InferenceEngine(spec, params, cfg, eos_token_id=2)
        engine.warmup()
        grid = engine._warmup_batch_grid()
        assert grid == (1, 2, 4)
        n_prefill = len(engine._prefill_fns)
        n_decode = len(engine._decode_fns)

        class TinyTok:
            eos_token_id = 2

            def decode(self, ids, skip_special_tokens=True):
                return "".join(f"<{i}>" for i in ids)

            def id_to_token(self, i):
                return f"<{i}>"

        async def go():
            b = Batcher(engine, TinyTok(), cfg)
            b.start()
            reqs = []
            # staggered mixed-size submissions: exercises batch sizes 1/2/4
            # and both buckets via add-on prefills mid-decode
            for wave, lens in ((0, [5, 5, 5, 5]), (1, [12, 12]), (2, [3])):
                for ln in lens:
                    reqs.append(GenRequest(
                        input_text="x", input_ids=list(range(1, ln + 1)),
                        params=RequestParams(max_new_tokens=8),
                        stopping=StoppingCriteria(max_new_tokens=8),
                        options=ResponseOptions()))
                for r in reqs[-len(lens):]:
                    b.submit(r)
                await asyncio.sleep(0.05)
            for r in reqs:
                await asyncio.wait_for(r.result_future, timeout=60)
            await b.stop()

        asyncio.run(go())
        assert len(engine._prefill_fns) == n_prefill, \
            f"in-loop prefill compiles: {set(engine._prefill_fns) - set()}"
        assert len(engine._decode_fns) == n_decode


class TestInt8KVCache:
    """kv_cache_dtype=int8: symmetric per-token-per-head KV quantization on
    the ring decode path. Halves decode attention's HBM reads; must be
    invisible in the greedy token stream on the tiny fixture (int8 KV is
    near-lossless; large logit gaps survive the <1% score perturbation)."""

    def _build(self, kv, chunk=4, ctx_buckets=None):
        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=32, max_batch_slots=3,
            prefill_buckets=[8, 16], decode_chunk=chunk,
            decode_write_mode="ring", decode_ctx_buckets=ctx_buckets,
            kv_cache_dtype=kv)
        cfg.validate()
        return InferenceEngine(spec, params, cfg, eos_token_id=2)

    def test_greedy_stream_matches_fp(self):
        fp = run_single(self._build("auto"), PROMPTS[0], 24)
        q8 = run_single(self._build("int8"), PROMPTS[0], 24)
        assert q8 == fp

    def test_with_ctx_buckets_and_multislot(self):
        """int8 + context buckets + staggered multi-slot admission (the
        bucket slice must carry the scale arrays along)."""
        eng_fp = self._build("auto", ctx_buckets=[8, 16, 32, 64])
        eng_q8 = self._build("int8", ctx_buckets=[8, 16, 32, 64])
        outs = []
        for eng in (eng_fp, eng_q8):
            sa = eng.acquire_slot()
            res = eng.prefill([sa], [PROMPTS[0]], [RequestParams()])
            out_a = [int(res.first_token.next_ids[0])]
            sb = eng.acquire_slot()
            res = eng.prefill([sb], [PROMPTS[1]], [RequestParams()])
            out_b = [int(res.first_token.next_ids[0])]
            for _ in range(5):
                for step in eng.decode_steps():
                    out_a.append(int(step.next_ids[sa]))
                    out_b.append(int(step.next_ids[sb]))
            outs.append((out_a, out_b))
        assert outs[0] == outs[1]

    def test_quantize_roundtrip_error_bound(self):
        from text_generation_inference_tpu.models.core import quantize_kv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 2, 8, 16)) * 3.0, jnp.float32)
        q, sc = quantize_kv(x)
        back = np.asarray(q, np.float32) * np.asarray(sc)[..., None]
        err = np.abs(back - np.asarray(x))
        # absmax/127 scale: error <= scale/2 per element
        assert (err <= np.asarray(sc)[..., None] / 2 + 1e-6).all()

    def test_sampling_seeded_matches_fp(self):
        rp = RequestParams(temperature=0.8, top_k=10, seed=7)
        fp = run_single(self._build("auto"), PROMPTS[1], 16, rp=rp)
        q8 = run_single(self._build("int8"), PROMPTS[1], 16, rp=rp)
        assert q8 == fp

    def test_requires_ring_path(self):
        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=32, max_batch_slots=2,
            prefill_buckets=[8, 16], decode_chunk=1,
            kv_cache_dtype="int8")
        cfg.validate()
        with pytest.raises(ValueError, match="ring"):
            InferenceEngine(spec, params, cfg, eos_token_id=2)

    def test_warmup_and_reset(self):
        eng = self._build("int8", chunk=2)
        eng.warmup()
        assert len(eng.free_slots) == eng.num_slots
        fp = run_single(self._build("auto", chunk=2), PROMPTS[2], 12)
        assert run_single(eng, PROMPTS[2], 12) == fp
        eng.reset()
        assert run_single(eng, PROMPTS[2], 12) == fp
