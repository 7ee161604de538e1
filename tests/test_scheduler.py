"""Scheduler unit tests with a fake engine (no accelerator).

The reference has no router unit tests (SURVEY §4 flags this as a gap to
close); these exercise queue admission, padding limits, queue-jumping
fairness, the waiting-tokens throttle, and stopping behavior against a
deterministic fake engine.
"""

import asyncio
import time

import numpy as np
import pytest

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.engine import (
    PrefillResult,
    RequestParams,
    StepResult,
)
from text_generation_inference_tpu.scheduler.batcher import Batcher
from text_generation_inference_tpu.scheduler.request import (
    GenRequest,
    ResponseOptions,
    StoppingCriteria,
    StopReason,
)


class FakeTokenizer:
    """Deterministic toy tokenizer: id i <-> token f"<{i}>"."""

    eos_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [int(t) for t in text.split() if t.isdigit()]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(f"<{i}>" for i in ids)

    def id_to_token(self, i):
        return f"<{i}>"


class FakeEngine:
    """Echo engine: emits (last_prompt_token + step) mod 97 + 1 per slot."""

    def __init__(self, num_slots=4, step_duration=0.0):
        self.num_slots = num_slots
        self.eos_token_id = 0
        self.free_slots = list(range(num_slots))
        self.slot_state = {}
        self.step_duration = step_duration
        self.prefill_calls = []
        self.decode_calls = 0
        self.last_forward_ns = 0

    @property
    def num_active(self):
        return self.num_slots - len(self.free_slots)

    def acquire_slot(self):
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot):
        self.slot_state.pop(slot, None)
        self.free_slots.append(slot)

    def _mk_step(self, rows):
        n = len(rows)
        cap = 20
        return StepResult(
            next_ids=np.asarray(rows, np.int32),
            logprob=np.full((n,), -1.0, np.float32),
            rank=np.ones((n,), np.int32),
            top_ids=np.zeros((n, cap), np.int32),
            top_logprobs=np.full((n, cap), -1.0, np.float32),
            top_scores=np.full((n, cap), 0.5, np.float32),
        )

    def prefill(self, slots, token_ids, params, want_prompt_details=False,
                prefix_embeds=None):
        time.sleep(self.step_duration)
        self.prefill_calls.append(list(slots))
        firsts = []
        for slot, toks in zip(slots, token_ids):
            self.slot_state[slot] = {"base": toks[-1] if toks else 1, "step": 0}
            firsts.append(self._tok(slot))
        return PrefillResult(first_token=self._mk_step(firsts),
                             prompt_details=None)

    def _tok(self, slot):
        st = self.slot_state[slot]
        tok = (st["base"] + st["step"]) % 97 + 1
        st["step"] += 1
        return tok

    def decode(self):
        time.sleep(self.step_duration)
        self.decode_calls += 1
        rows = []
        for s in range(self.num_slots):
            rows.append(self._tok(s) if s in self.slot_state else 0)
        return self._mk_step(rows)


def make_request(prompt_ids, max_new=5, stop_seqs=(), streaming=False,
                 min_new=0, time_limit=0):
    return GenRequest(
        input_text=" ".join(str(i) for i in prompt_ids),
        input_ids=list(prompt_ids),
        params=RequestParams(max_new_tokens=max_new, min_new_tokens=min_new),
        stopping=StoppingCriteria(
            max_new_tokens=max_new, min_new_tokens=min_new,
            time_limit_millis=time_limit, stop_sequences=list(stop_seqs)),
        options=ResponseOptions(),
        streaming=streaming,
    )


def run_async(coro):
    return asyncio.run(coro)


def make_batcher(engine=None, **cfg_kw):
    cfg = ServingConfig(
        max_sequence_length=128, max_new_tokens=64, max_batch_slots=4,
        prefill_buckets=[8, 16, 32], max_waiting_tokens=4, **cfg_kw)
    cfg.validate()
    engine = engine or FakeEngine()
    return Batcher(engine, FakeTokenizer(), cfg), engine


class TestBasicFlow:
    def test_single_request_completes(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            req = make_request([10, 20, 30], max_new=4)
            b.submit(req)
            await asyncio.wait_for(self._wait(req), timeout=5)
            assert req.stop_reason == StopReason.MAX_TOKENS
            assert req.generated_count == 4
            await b.stop()
        run_async(go())

    async def _wait(self, req):
        while req.result_future is None:
            await asyncio.sleep(0.01)
        await req.result_future

    def test_eos_stops(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            # base 96: first token (96+0)%97+1 = 97, second (96+1)%97+1=1,
            # third (96+2)%97+1=2 ... never 0; craft eos: engine never emits 0
            # for active slots, so use max_new instead; instead simulate stop
            # sequence path
            req = make_request([5], max_new=3)
            b.submit(req)
            await asyncio.wait_for(self._wait(req), timeout=5)
            assert req.stop_reason == StopReason.MAX_TOKENS
            await b.stop()
        run_async(go())

    def test_stop_sequence(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            # engine emits deterministic tokens: base=7 -> 8, 9, 10, ...
            stop = "<9>"
            req = make_request([7], max_new=10, stop_seqs=[stop])
            b.submit(req)
            await asyncio.wait_for(self._wait(req), timeout=5)
            assert req.stop_reason == StopReason.STOP_SEQUENCE
            assert req.matched_stop[0] == stop
            assert req.final_text().endswith("<9>")
            await b.stop()
        run_async(go())

    def test_time_limit(self):
        async def go():
            b, eng = make_batcher(FakeEngine(step_duration=0.02))
            b.start()
            req = make_request([3], max_new=50, time_limit=30)
            b.submit(req)
            await asyncio.wait_for(self._wait(req), timeout=5)
            assert req.stop_reason == StopReason.TIME_LIMIT
            assert req.generated_count >= 1
            await b.stop()
        run_async(go())


class TestTimeLimitClock:
    """The time-limit clock starts at request ARRIVAL, not at prefill
    (reference: grpc_server.rs:560-563 arms the deadline at parameter
    conversion; queue.rs:198-227 early-times-out expired queued entries)."""

    async def _wait(self, req):
        await asyncio.wait_for(req.result_future, timeout=10)

    def test_queue_wait_counts_against_time_limit(self):
        async def go():
            # 1 slot; a long-running request occupies it, so the limited
            # request's queue wait alone exceeds its deadline even though
            # its generation (3 tokens x 10ms) would not
            b, eng = make_batcher(FakeEngine(num_slots=1, step_duration=0.01))
            b.start()
            hog = make_request([2], max_new=30)
            limited = make_request([3], max_new=3, time_limit=120)
            b.submit(hog)
            b.submit(limited)
            await self._wait(hog)
            await self._wait(limited)
            assert limited.stop_reason == StopReason.TIME_LIMIT
            await b.stop()
        run_async(go())

    def test_early_timeout_in_queue_zero_tokens(self):
        async def go():
            b, eng = make_batcher(FakeEngine(num_slots=1, step_duration=0.01))
            b.start()
            hog = make_request([2], max_new=40)
            limited = make_request([3], max_new=3, time_limit=40)
            b.submit(hog)
            b.submit(limited)
            await self._wait(limited)
            assert limited.stop_reason == StopReason.TIME_LIMIT
            assert limited.generated_count == 0
            assert limited.final_text() == ""
            await self._wait(hog)
            await b.stop()
        run_async(go())


class TestAdmission:
    def test_batched_admission_up_to_free_slots(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            reqs = [make_request([i + 1] * 4, max_new=3) for i in range(6)]
            for r in reqs:
                b.submit(r)
            for r in reqs:
                await asyncio.wait_for(self._wait(r), timeout=5)
            # first prefill batch must have used all 4 slots
            assert len(eng.prefill_calls[0]) == 4
            await b.stop()
        run_async(go())

    async def _wait(self, req):
        while req.result_future is None:
            await asyncio.sleep(0.01)
        await req.result_future

    def test_padding_limit_blocks_mixed_batch(self):
        b, eng = make_batcher()
        # short request (len 2 -> bucket 8) + long request (len 30 -> bucket 32):
        # padding fraction for joint batch = (64-32)/64 = 0.5 > 0.2 default
        short = make_request([1, 2])
        long = make_request(list(range(1, 31)))
        b.queue.extend([short, long])
        batch = b._pick_prefill_batch()
        assert batch == [short]

    def test_queue_jump_within_window(self):
        b, eng = make_batcher()
        long = make_request(list(range(1, 31)))
        short1 = make_request([1, 2])
        short2 = make_request([3, 4])
        b.queue.extend([short1, long, short2])
        batch = b._pick_prefill_batch()
        # long can be jumped (it is young); the two shorts batch together
        assert short1 in batch and short2 in batch and long not in batch

    def test_no_jump_over_old_entry(self):
        b, eng = make_batcher()
        long = make_request(list(range(1, 31)))
        long.queue_time = time.monotonic() - 2.0   # older than 1s cutoff
        short1 = make_request([1, 2])
        short2 = make_request([3, 4])
        b.queue.extend([short1, long, short2])
        batch = b._pick_prefill_batch()
        assert batch == [short1]


class TestConcurrencyLimit:
    def test_queue_full_raises(self):
        async def go():
            b, eng = make_batcher(max_concurrent_requests=2)
            r1, r2, r3 = (make_request([1]), make_request([2]), make_request([3]))
            b.submit(r1)
            b.submit(r2)
            from text_generation_inference_tpu.scheduler.batcher import (
                QueueFullError)

            with pytest.raises(QueueFullError):
                b.submit(r3)
        run_async(go())


class TestStreaming:
    def test_stream_events_and_parity(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            req = make_request([11], max_new=4, streaming=True)
            b.submit(req)
            events = []
            while True:
                while req.stream_queue is None:
                    await asyncio.sleep(0.005)
                ev = await asyncio.wait_for(req.stream_queue.get(), timeout=5)
                events.append(ev)
                if ev[0] == "final":
                    break
            token_text = "".join(e[2] for e in events if e[0] == "token")
            final_text = events[-1][2]
            assert token_text + final_text == req.final_text()
            assert events[-1][3] == StopReason.MAX_TOKENS
            await b.stop()
        run_async(go())

    def test_stream_holds_back_stop_prefix(self):
        async def go():
            b, eng = make_batcher()
            b.start()
            # tokens: base 7 -> "<8><9><10>..."; stop at "<10>" excluded
            req = make_request([7], max_new=10, stop_seqs=["<10>"],
                               streaming=True)
            req.stopping.include_stop_sequence = False
            b.submit(req)
            chunks = []
            while True:
                while req.stream_queue is None:
                    await asyncio.sleep(0.005)
                ev = await asyncio.wait_for(req.stream_queue.get(), timeout=5)
                if ev[0] == "token":
                    chunks.append(ev[2])
                elif ev[0] == "final":
                    chunks.append(ev[2])
                    break
            text = "".join(chunks)
            assert text == "<8><9>"
            await b.stop()
        run_async(go())


class FakeChunkEngine(FakeEngine):
    """FakeEngine with chunked decode that records the chunk length of
    every decode dispatch (stream-aware chunking assertions)."""

    supports_chunk_override = True
    decode_chunk = 6

    def __init__(self, **kw):
        super().__init__(**kw)
        self.chunk_calls = []

    def decode_steps(self, want_details=True, chunk=None):
        eff = chunk if chunk is not None else self.decode_chunk
        self.chunk_calls.append(chunk)
        return [self.decode() for _ in range(eff)]


class TestStreamAwareChunking:
    def test_streaming_request_shrinks_chunk(self):
        """With a streaming request active, decode dispatches use
        stream_decode_chunk; all-unary batches use the default chunk
        (None). A streaming client then sees bursts bounded by the small
        chunk instead of decode_chunk (reference streams per token,
        batcher.rs:972-991)."""
        async def go():
            eng = FakeChunkEngine()
            b, _ = make_batcher(engine=eng, stream_decode_chunk=2)
            b.start()
            sreq = make_request([11], max_new=9, streaming=True)
            b.submit(sreq)
            while sreq.stream_queue is None:
                await asyncio.sleep(0.005)
            while True:
                ev = await asyncio.wait_for(sreq.stream_queue.get(), timeout=5)
                if ev[0] == "final":
                    break
            streaming_chunks = list(eng.chunk_calls)
            # every dispatch made WHILE the streaming request was active
            # used the small chunk; a trailing dispatch issued right as it
            # finished may legitimately see no streaming request (None)
            assert streaming_chunks and streaming_chunks[0] == 2
            assert all(c == 2 for c in streaming_chunks if c is not None)

            # quiesce: a decode dispatched while the streaming request was
            # still active may land after the clear and pollute the
            # unary-phase assertion (pre-existing flake)
            while b._pending_decode is not None or b.active:
                await asyncio.sleep(0.005)
            eng.chunk_calls.clear()
            ureq = make_request([12], max_new=9)
            b.submit(ureq)
            await asyncio.wait_for(asyncio.shield(ureq.result_future), 5)
            assert eng.chunk_calls and all(c is None for c in eng.chunk_calls)
            await b.stop()
        run_async(go())

    def test_disabled_by_config(self):
        async def go():
            eng = FakeChunkEngine()
            b, _ = make_batcher(engine=eng, stream_decode_chunk=0)
            b.start()
            req = make_request([11], max_new=5, streaming=True)
            b.submit(req)
            while req.stream_queue is None:
                await asyncio.sleep(0.005)
            while True:
                ev = await asyncio.wait_for(req.stream_queue.get(), timeout=5)
                if ev[0] == "final":
                    break
            assert eng.chunk_calls and all(c is None for c in eng.chunk_calls)
            await b.stop()
        run_async(go())


class TestSubmitAtomicity:
    def test_batch_over_capacity_leaves_no_orphans(self):
        """A capacity-rejected batch must not leave earlier requests of the
        batch enqueued (reference reserves the whole batch upfront,
        grpc_server.rs:131-140)."""
        async def go():
            b, eng = make_batcher(max_concurrent_requests=2)
            from text_generation_inference_tpu.scheduler.batcher import (
                QueueFullError)

            reqs = [make_request([i + 1]) for i in range(3)]
            with pytest.raises(QueueFullError):
                b.submit_all(reqs)
            assert len(b.queue) == 0
            # a fitting batch still goes through
            b.submit_all(reqs[:2])
            assert len(b.queue) == 2
        run_async(go())


class TestPrefillThrottle:
    """Reference add-on semantics: min-size ramp (batcher.rs:464-471),
    prefill rate limiter (516-518), about-to-complete guard (459-461)."""

    def _batcher_with_active(self, n_active, steps_since=0, remaining=10):
        b, eng = make_batcher()
        for i in range(n_active):
            req = make_request([1], max_new=remaining)
            req.slot = eng.acquire_slot()
            b.active[req.slot] = req
        b.steps_since_prefill = steps_since
        return b, eng

    def test_ramp_requires_large_addon_when_fresh(self):
        # batch_size=3, waiting=0, max_waiting=4 -> min_size = 3*4//4 = 3
        b, eng = self._batcher_with_active(3, steps_since=0)
        b.queue.append(make_request([5]))
        assert b._should_prefill() is None     # 1 < min_size 3

    def test_ramp_decays_with_waiting_tokens(self):
        # batch_size=3, waiting=3, max_waiting=4 -> min_size = 3*1//4 = 0 -> 1
        b, eng = self._batcher_with_active(3, steps_since=3)
        b.queue.append(make_request([5]))
        batch = b._should_prefill()
        assert batch is not None and len(batch) == 1

    def test_waited_past_max_admits_single(self):
        b, eng = self._batcher_with_active(3, steps_since=4)
        b.queue.append(make_request([5]))
        assert b._should_prefill() is not None

    def test_rate_limiter_blocks_addon(self):
        b, eng = self._batcher_with_active(1, steps_since=100)
        b._next_prefill_after = time.monotonic() + 60.0
        b.queue.append(make_request([5]))
        assert b._should_prefill() is None

    def test_rate_limiter_expired_admits(self):
        b, eng = self._batcher_with_active(1, steps_since=100)
        b._next_prefill_after = time.monotonic() - 0.1
        b.queue.append(make_request([5]))
        assert b._should_prefill() is not None

    def test_rate_limiter_ignored_with_empty_batch(self):
        b, eng = make_batcher()
        b._next_prefill_after = time.monotonic() + 60.0
        b.queue.append(make_request([5]))
        # no active batch: initial prefill is never rate-limited
        assert b._should_prefill() is not None

    def test_about_to_complete_guard(self):
        # all active requests within 1 token of done: don't extend
        b, eng = self._batcher_with_active(2, steps_since=100, remaining=5)
        for req in b.active.values():
            for _ in range(4):   # 4 of 5 tokens generated -> remaining 1
                from text_generation_inference_tpu.scheduler.request import (
                    TokenRecord)
                req.generated.append(TokenRecord(token_id=1))
        b.queue.append(make_request([5]))
        assert b._should_prefill() is None


class FailingEngine(FakeEngine):
    """FakeEngine whose prefill can be armed to raise."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.fail_next_prefill = None   # exception instance to raise once
        self.reset_calls = 0

    def prefill(self, *a, **kw):
        if self.fail_next_prefill is not None:
            exc, self.fail_next_prefill = self.fail_next_prefill, None
            raise exc
        return super().prefill(*a, **kw)

    def reset(self):
        self.reset_calls += 1
        self.slot_state.clear()
        self.free_slots = list(range(self.num_slots))


class TestErrorScoping:
    async def _wait(self, req):
        while req.result_future is None:
            await asyncio.sleep(0.01)
        await req.result_future

    def test_host_error_scoped_to_prefill_batch(self):
        """A host-side prefill failure fails only that batch; an already
        decoding request keeps generating (reference: batcher.rs:725-737)."""
        async def go():
            eng = FailingEngine()
            b, _ = make_batcher(engine=eng)
            b.start()
            ok = make_request([3], max_new=30)
            b.submit(ok)
            # wait until ok is actively decoding
            while not b.active:
                await asyncio.sleep(0.005)
            eng.fail_next_prefill = ValueError("boom (host)")
            bad = make_request([4], max_new=3)
            b.submit(bad)
            await asyncio.wait_for(self._wait(bad), timeout=5)
            assert bad.stop_reason == StopReason.ERROR
            assert eng.reset_calls == 0
            # survivor still completes normally
            await asyncio.wait_for(self._wait(ok), timeout=10)
            assert ok.stop_reason != StopReason.ERROR
            await b.stop()
        run_async(go())

    def test_device_error_resets_engine_and_recovers(self):
        async def go():
            from text_generation_inference_tpu.engine.engine import (
                EngineDeviceError)

            eng = FailingEngine()
            b, _ = make_batcher(engine=eng)
            b.start()
            eng.fail_next_prefill = EngineDeviceError("device dead")
            bad = make_request([4], max_new=3)
            b.submit(bad)
            await asyncio.wait_for(self._wait(bad), timeout=5)
            assert bad.stop_reason == StopReason.ERROR
            assert eng.reset_calls == 1
            assert len(eng.free_slots) == eng.num_slots
            # server recovers: next request generates fine
            ok = make_request([3], max_new=3)
            b.submit(ok)
            await asyncio.wait_for(self._wait(ok), timeout=10)
            assert ok.stop_reason != StopReason.ERROR
            await b.stop()
        run_async(go())
