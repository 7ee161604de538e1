"""The continuous-batching loop.

Single-controller equivalent of the reference's batching task + queue
(reference: router/src/batcher.rs:399-570, router/src/queue.rs:236-461):

  * admission: FIFO with bounded queue-jumping (entries waiting longer than
    the 1s fairness cutoff cannot be jumped over, queue.rs:30-32), subject to
    free engine slots and the prefill-padding-proportion limit;
  * a waiting-tokens throttle + minimum add-on batch size ramp before
    interrupting decode with a prefill (batcher.rs:459-471);
  * per-token stopping-criteria evaluation in exactly the reference's order
    (batcher.rs:757-784): time limit, min_new_tokens, EOS, max_new_tokens,
    stop sequences;
  * incremental detokenization + stream fan-out with stop-sequence hold-back.

Engine steps run in a worker thread so the asyncio front-end stays live.
"""

from __future__ import annotations

import asyncio
import contextlib
import logging
import time
from collections import deque
from functools import partial
from typing import Optional

import numpy as np

from ..config import ServingConfig
from ..engine.engine import EngineDeviceError, InferenceEngine, StepResult
from ..utils import metrics, tracing
from .request import (GenRequest, ResponseOptions, StopReason,
                      StoppingCriteria, TokenRecord)

logger = logging.getLogger(__name__)

# entries that have waited longer than this may not be jumped over
# (reference: router/src/queue.rs:30-32)
QUEUE_JUMP_CUTOFF_S = 1.0

# batches within this many tokens of fully completing are not extended
# (reference: batcher.rs:459-461 "don't interfere if about to complete")
NEARLY_DONE_TOKENS = 2


class QueueFullError(Exception):
    pass


class Batcher:
    def __init__(self, engine: InferenceEngine, tokenizer, config: ServingConfig,
                 prompt_cache=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.config = config
        self.prompt_cache = prompt_cache
        self.queue: deque[GenRequest] = deque()
        self.active: dict[int, GenRequest] = {}   # slot -> request
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._stopping = False
        self.steps_since_prefill = 0
        # prefill rate limiter: no add-on prefill before this monotonic time
        # (reference: batcher.rs:516-518 — wait at least half as long as the
        # last prefill took before doing another)
        self._next_prefill_after = 0.0
        self.healthy = True
        self.last_tick = time.monotonic()   # last completed loop iteration
        metrics.preregister()   # full tgi_* series visible from boot
        # in-flight decode dispatch (pipelining: the device computes the next
        # chunk while the host processes the previous one)
        self._pending_decode = None

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> None:
        self._task = asyncio.get_running_loop().create_task(self.run())

    async def stop(self) -> None:
        self._stopping = True
        self._wake.set()
        if self._task:
            await self._task

    # -- submission ---------------------------------------------------------

    def submit(self, req: GenRequest) -> None:
        self.submit_all([req])

    def submit_all(self, reqs: list[GenRequest]) -> None:
        """Admit a whole batch or nothing: capacity is checked for the full
        batch before any request is enqueued, so a capacity rejection can
        never leave earlier requests of the batch generating with no
        consumer (reference: grpc_server.rs:131-140 reserves the whole
        batch's semaphore permits upfront)."""
        if (len(self.queue) + len(self.active) + len(reqs)
                > self.config.max_concurrent_requests):
            metrics.increment("tgi_request_failure", reason="conc_limit")
            raise QueueFullError("too many requests in progress")
        loop = asyncio.get_running_loop()
        for req in reqs:
            req.attach_loop(loop)
            self.queue.append(req)
        metrics.gauge_set("tgi_queue_size", len(self.queue))
        self._wake.set()

    # -- admission ----------------------------------------------------------

    def _padding_ok(self, lens: list[int]) -> bool:
        """Inter-sequence padding proportion limit (reference:
        queue.rs max_prefill_padding): padding is measured against the batch
        max length — bucket-rounding waste is a fixed compile-shape cost and
        deliberately not counted, so equal-length requests always batch."""
        if len(lens) <= 1:
            return True
        total = max(lens) * len(lens)
        padding = total - sum(lens)
        return padding / total <= self.config.max_prefill_padding

    def _pick_prefill_batch(self) -> list[GenRequest]:
        # cap the dispatch at max_prefill_batch: bounds the prefill
        # activation peak and keeps the batch grid within the shapes
        # warmup() pre-compiled
        free = min(len(self.engine.free_slots),
                   self.config.max_prefill_batch)
        if free == 0 or not self.queue:
            return []
        now = time.monotonic()
        chosen: list[GenRequest] = []
        lens: list[int] = []
        # paged engines meter KV capacity in pages — the reference's
        # token-weight admission walk (queue.rs:305-344, batch_types.rs)
        # realized exactly: reserved pages ARE worst-case token weight.
        # Slot engines statically preallocate [S, max_seq] KV, so the
        # worst-case weight scan is vacuous there (admission can never
        # overcommit memory); only the free-slot count limits.
        alloc = getattr(self.engine, "allocator", None)
        reserved_pages = 0
        skipped_any = False   # for tgi_queue_jump (reference: queue.rs:287)
        for req in list(self.queue):
            if len(chosen) >= free:
                break
            if req.cancelled:
                continue
            total_len = req.prefix_length + req.input_length
            budget = total_len + req.params.max_new_tokens + 1
            fits = True
            need = 0
            if alloc is not None:
                need = alloc.pages_needed(budget)
                fits = (reserved_pages + need <= alloc.num_free
                        and need <= alloc.max_pages_per_slot)
            padding_ok = self._padding_ok(lens + [total_len])
            if fits and padding_ok:
                if skipped_any:
                    metrics.increment("tgi_queue_jump")
                chosen.append(req)
                lens.append(total_len)
                reserved_pages += need
            else:
                if not fits:
                    # pages ARE the token-weight budget for the paged engine
                    metrics.increment("tgi_prefill_weight_limit_exceeded")
                elif not padding_ok:
                    metrics.increment("tgi_prefill_padding_limit_exceeded")
                if now - req.queue_time >= QUEUE_JUMP_CUTOFF_S:
                    # fairness: an old entry may not be jumped over
                    break
                skipped_any = True
        # round the batch DOWN to a power of two: each (n, bucket) pair is a
        # separate XLA compilation, so prefill batch sizes are restricted to
        # 1/2/4/8/... (leftover requests go in the next prefill)
        if len(chosen) > 1:
            n = 1
            while n * 2 <= len(chosen):
                n *= 2
            chosen = chosen[:n]
        return chosen

    def _should_prefill(self) -> Optional[list[GenRequest]]:
        if not self.queue or not self.engine.free_slots:
            return None
        min_size = 1
        if self.active:
            # add-on prefill (decode in progress): apply the rate limiter,
            # the about-to-complete guard, and the min-size ramp — all
            # reference semantics (batcher.rs:459-471, 516-518)
            if time.monotonic() < self._next_prefill_after:
                return None
            remaining = max(
                (r.stopping.max_new_tokens - r.generated_count
                 for r in self.active.values()), default=0)
            if remaining < NEARLY_DONE_TOKENS:
                return None
            batch_size = len(self.active)
            waiting = self.steps_since_prefill
            max_waiting = self.config.max_waiting_tokens
            if batch_size > 1 and waiting < max_waiting:
                min_size = max(
                    1, (batch_size * (max_waiting - waiting)) // max_waiting)
        batch = self._pick_prefill_batch()
        if len(batch) >= min_size:
            return batch
        return None

    # -- main loop ----------------------------------------------------------

    async def run(self) -> None:
        loop = asyncio.get_running_loop()
        while not self._stopping:
            self.last_tick = time.monotonic()
            self._reap_cancelled_queued()
            if self._pending_decode is None and not self.active and not self.queue:
                self._wake.clear()
                # nothing to do; wait for work
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=1.0)
                except asyncio.TimeoutError:
                    pass
                continue

            try:
                if self._pending_decode is not None:
                    # drain the in-flight decode; an admissible prefill
                    # OVERLAPS the fetch instead of waiting behind it (JAX
                    # dispatch is async: the prefill queues on device right
                    # after the chunk, so a new request's first token costs
                    # ~prefill time instead of chunk-drain + prefill —
                    # measured p50 TTFT at QPS 1 was dominated by that
                    # drain). Stale chunk rows can then target slots whose
                    # NEW request was prefilled after the chunk dispatched;
                    # _handle_decode_results drops them via the dispatch-
                    # time epoch (req.start_time > chunk t0).
                    fut = self._pending_decode
                    next_begun = None
                    prefill_task = None
                    pipelined = getattr(
                        self.engine, "supports_decode_pipeline", False)
                    batch = self._should_prefill() if pipelined else None
                    if batch is not None:
                        prefill_task = loop.create_task(
                            self._do_prefill(loop, batch))
                    elif pipelined and self.active:
                        # pipeline: dispatch chunk N+1 BEFORE fetching N —
                        # the device computes N+1 while N's outputs cross
                        # the host link (~30ms on a remote-TPU tunnel)
                        next_begun = self._decode_begin()
                    try:
                        if prefill_task is None and pipelined:
                            # watch for arrivals while the chunk completes:
                            # a request landing mid-fetch is admitted NOW,
                            # overlapping the remaining chunk time
                            self._wake.clear()
                            wake_task = loop.create_task(self._wake.wait())
                            done, _ = await asyncio.wait(
                                {fut, wake_task},
                                return_when=asyncio.FIRST_COMPLETED)
                            wake_task.cancel()
                            if fut not in done:
                                batch = self._should_prefill()
                                if batch is not None:
                                    prefill_task = loop.create_task(
                                        self._do_prefill(loop, batch))
                        steps = await fut
                    except BaseException:
                        # the already-dispatched next chunk is poisoned with
                        # this one; the error handlers below reset the engine
                        self._pending_decode = None
                        if prefill_task is not None:
                            with contextlib.suppress(BaseException):
                                await prefill_task
                        raise
                    self._pending_decode = None
                    if prefill_task is not None:
                        # engine ops are not concurrent-safe: the next
                        # decode dispatch must wait for the prefill
                        # (_do_prefill handles its own failures)
                        await prefill_task
                    if next_begun is not None:
                        # chunk N+1 was dispatched before any mid-await
                        # prefill: its outputs MUST still be fetched (its
                        # tokens are real; a later-prefilled slot's rows
                        # are dropped by the epoch check)
                        self._pending_decode = loop.run_in_executor(
                            None, self._decode_end, next_begun)
                    elif prefill_task is None and (not pipelined) \
                            and self.active \
                            and self._should_prefill() is None:
                        self._pending_decode = loop.run_in_executor(
                            None, self._decode_call)
                    self._handle_decode_results(steps)
                    self.healthy = True
                    continue

                batch = self._should_prefill()
                if batch:
                    await self._do_prefill(loop, batch)
                elif self.active:
                    if getattr(self.engine, "supports_decode_pipeline",
                               False):
                        self._pending_decode = loop.run_in_executor(
                            None, self._decode_end, self._decode_begin())
                    else:
                        self._pending_decode = loop.run_in_executor(
                            None, self._decode_call)
                else:
                    # queued requests exist but none admissible right now
                    await asyncio.sleep(0.001)
                self.healthy = True
            except EngineDeviceError:
                # a failed device step consumed its donated buffers: all
                # in-flight state is lost, but the engine is rebuilt so the
                # server keeps serving new requests
                logger.exception("device step failed; resetting engine state")
                self.healthy = False
                self._pending_decode = None
                metrics.increment("tgi_batch_inference_failure",
                                  method="next_token", reason="error")
                self._fail_all("internal inference error", engine_reset=True)
            except Exception:
                # host-side error: device state is still consistent, but
                # which tokens were processed is ambiguous — fail active
                # requests, keep the engine state
                logger.exception("batching loop error; failing in-flight requests")
                self.healthy = False
                self._pending_decode = None
                metrics.increment("tgi_batch_inference_failure",
                                  method="next_token", reason="error")
                self._fail_all("internal inference error")

    async def _do_prefill(self, loop, batch: list[GenRequest]) -> None:
        slots = []
        now = time.monotonic()
        for req in batch:
            slot = self.engine.acquire_slot()
            assert slot is not None
            req.slot = slot
            req.begin(self.tokenizer)
            self.active[slot] = req
            self.queue.remove(req)
            metrics.observe("tgi_request_queue_duration",
                            now - req.queue_time)
        metrics.gauge_set("tgi_queue_size", len(self.queue))
        metrics.increment("tgi_batch_inference_count", method="prefill")
        metrics.observe("tgi_batch_inference_batch_size", len(batch),
                        method="prefill")
        # total prefill tokens including bucket padding (reference:
        # tgi_batch_next_tokens counts padded prefill tokens)
        max_len = max(r.prefix_length + r.input_length for r in batch)
        bucket = next((b for b in self.config.prefill_buckets
                       if b >= max_len), max_len)
        metrics.observe("tgi_batch_next_tokens", bucket * len(batch))
        want_details = any(r.options.input_tokens for r in batch)
        try:
            prefix_embeds = None
            if any(r.prefix_id for r in batch):
                prefix_embeds = [
                    self.prompt_cache.get_entry(r.prefix_id)
                    if r.prefix_id else None
                    for r in batch]
            t0 = time.monotonic()
            result = await loop.run_in_executor(
                None,
                partial(
                    self.engine.prefill,
                    [r.slot for r in batch],
                    [r.input_ids for r in batch],
                    [r.params for r in batch],
                    want_prompt_details=want_details,
                    prefix_embeds=prefix_embeds,
                ),
            )
        except EngineDeviceError:
            logger.exception("prefill device step failed; resetting engine")
            metrics.increment("tgi_batch_inference_failure",
                              method="prefill", reason="error")
            for req in batch:
                self.active.pop(req.slot, None)
                req.slot = None
            self._fail_requests(batch, "internal inference error")
            self._fail_all("internal inference error", engine_reset=True)
            return
        except Exception:
            # host-side failure (e.g. prompt-cache lookup): device state is
            # untouched — fail ONLY this batch, decode continues
            logger.exception("prefill failed host-side; scoping to batch")
            metrics.increment("tgi_batch_inference_failure",
                              method="prefill", reason="error")
            for req in batch:
                self.active.pop(req.slot, None)
                self.engine.free(req.slot)
                req.slot = None
            self._fail_requests(batch, "internal inference error")
            return
        prefill_duration = time.monotonic() - t0
        metrics.observe("tgi_batch_inference_duration", prefill_duration,
                        method="prefill")
        metrics.observe("tgi_batch_inference_forward_duration",
                        self.engine.last_forward_ns / 1e9, method="prefill")
        metrics.increment("tgi_batch_inference_success", method="prefill")
        with tracing.span("batcher.prefill", batch_size=len(batch)) as s:
            tracing.record(s, duration_s=prefill_duration)
        self._next_prefill_after = time.monotonic() + prefill_duration / 2
        self.steps_since_prefill = 0

        if want_details and result.prompt_details is not None:
            self._emit_input_tokens(batch, result.prompt_details)
        t_proc = time.monotonic()
        self._process_step({i: r for i, r in enumerate(batch)}, result.first_token)
        metrics.observe("tgi_batch_inference_tokproc_duration",
                        time.monotonic() - t_proc, method="prefill")
        self._update_batch_gauges()

    def _chunk_override(self) -> Optional[int]:
        """Small decode chunk while any active request streams: a streaming
        client's inter-token latency equals the chunk latency (tokens only
        reach the host at chunk end), so the throughput chunk (64) would
        deliver ~64-token bursts. The reference streams per token
        (router/src/batcher.rs:972-991); a small chunk bounds the burst at
        stream_decode_chunk steps while all-unary batches keep the
        throughput chunk. None = engine default."""
        sc = self.config.stream_decode_chunk
        if not sc or not getattr(self.engine, "supports_chunk_override", False):
            return None
        if any(r.streaming for r in self.active.values()):
            return sc
        return None

    def _decode_begin(self):
        """Dispatch one decode chunk on the loop thread (non-blocking JAX
        enqueue); the matching _decode_end fetch runs on the executor.
        Engines advertising supports_decode_pipeline only."""
        want = any(r.options.generated_tokens
                   for r in self.active.values())
        chunk = self._chunk_override()
        t0 = time.monotonic()
        if chunk is not None:
            return self.engine.decode_steps_begin(
                want_details=want, chunk=chunk), t0
        return self.engine.decode_steps_begin(want_details=want), t0

    def _decode_end(self, begun):
        """Executor thread: fetch the outputs of a dispatched chunk.
        With two-deep pipelining the observed duration spans queueing
        behind the previous chunk — i.e. true chunk latency."""
        handle, t0 = begun
        steps = self.engine.decode_steps_end(handle)
        metrics.observe("tgi_batch_inference_duration",
                        time.monotonic() - t0, method="next_token")
        metrics.increment("tgi_batch_inference_count", method="next_token")
        metrics.increment("tgi_batch_inference_success", method="next_token")
        metrics.observe("tgi_batch_inference_batch_size", len(self.active),
                        method="next_token")
        return steps, getattr(self.engine, "last_n_emitted", None), t0

    def _decode_call(self):
        """Runs on the executor thread: one engine decode dispatch + fetch.
        Returns (steps, n_emit) captured atomically with the call."""
        t0 = time.monotonic()
        decode_fn = getattr(self.engine, "decode_steps", None)
        if decode_fn is not None:
            # the no-details decode program skips logprob/top-n work when no
            # active request asked for token info (reference computes
            # details only on request)
            want = any(r.options.generated_tokens
                       for r in self.active.values())
            chunk = self._chunk_override()
            try:
                if chunk is not None:
                    steps = decode_fn(want_details=want, chunk=chunk)
                else:
                    steps = decode_fn(want_details=want)
            except TypeError:
                steps = decode_fn()
        else:
            steps = [self.engine.decode()]
        metrics.observe("tgi_batch_inference_duration", time.monotonic() - t0,
                        method="next_token")
        metrics.increment("tgi_batch_inference_count", method="next_token")
        metrics.increment("tgi_batch_inference_success", method="next_token")
        metrics.observe("tgi_batch_inference_batch_size", len(self.active),
                        method="next_token")
        return steps, getattr(self.engine, "last_n_emitted", None), t0

    def _handle_decode_results(self, result) -> None:
        steps, n_emit, dispatch_t0 = result
        self.steps_since_prefill += len(steps)
        t_proc = time.monotonic()
        for j, step in enumerate(steps):
            # re-snapshot active each sub-step: requests that stop mid-chunk
            # must not consume the chunk's remaining (discarded) tokens
            if not self.active:
                break
            rows = {
                slot: req for slot, req in list(self.active.items())
                # epoch guard: a request prefilled AFTER this chunk was
                # dispatched (overlapped prefill) must not consume the
                # chunk's rows for its slot — they belong to whatever
                # occupied the slot when the chunk ran
                if (n_emit is None or j < n_emit[slot])
                and (req.start_time is None or req.start_time <= dispatch_t0)
            }
            if rows:
                self._process_step(rows, step)
        # host-side token processing time, split from device forward time
        # (reference: tgi_batch_inference_tokproc_duration vs
        # forward_duration, batcher.rs:700-713)
        tokproc_s = time.monotonic() - t_proc
        forward_s = self.engine.last_forward_ns / 1e9
        metrics.observe("tgi_batch_inference_tokproc_duration",
                        tokproc_s, method="next_token")
        metrics.observe("tgi_batch_inference_forward_duration",
                        forward_s, method="next_token")
        self._update_batch_gauges()
        if tracing.enabled():
            with tracing.span("batcher.next_token",
                              steps=len(steps)) as sp:
                tracing.record(sp, forward_s=forward_s, tokproc_s=tokproc_s)

    def _update_batch_gauges(self) -> None:
        """Current-batch gauges (reference: tgi_batch_current_size,
        tgi_batch_input_tokens, tgi_batch_max_remaining_tokens)."""
        active = list(self.active.values())
        metrics.gauge_set("tgi_batch_current_size", len(active))
        metrics.gauge_set("tgi_batch_input_tokens",
                          sum(r.prefix_length + r.input_length
                              for r in active))
        metrics.gauge_set(
            "tgi_batch_max_remaining_tokens",
            max((r.stopping.max_new_tokens - r.generated_count
                 for r in active), default=0))

    # -- token processing ---------------------------------------------------

    def _make_record(self, req: GenRequest, step: StepResult, row: int) -> TokenRecord:
        rec = TokenRecord(token_id=int(step.next_ids[row]))
        opts = req.options
        if opts.generated_tokens:
            if opts.token_logprobs:
                rec.logprob = float(step.logprob[row])
            if opts.token_ranks:
                rec.rank = int(step.rank[row])
            if opts.top_n_tokens:
                rec.top_tokens = self._top_n(
                    step.top_ids[row], step.top_logprobs[row],
                    step.top_scores[row], opts.top_n_tokens)
        return rec

    @staticmethod
    def _top_n(top_ids, top_logprobs, top_scores, n: int) -> list[tuple[int, float]]:
        """Select candidates >= the n-th highest score, capped at 4n entries
        (reference: tokens.py:402-418)."""
        n = min(n, len(top_ids))
        nth = top_scores[n - 1]
        out = []
        for i in range(min(len(top_ids), 4 * n)):
            if top_scores[i] < nth or top_scores[i] == -np.inf:
                break
            out.append((int(top_ids[i]), float(top_logprobs[i])))
        return out

    def _process_step(self, rows: dict[int, GenRequest], step: StepResult) -> None:
        now = time.monotonic()
        for row, req in rows.items():
            tok_id = int(step.next_ids[row])
            rec = self._make_record(req, step, row)
            req.generated.append(rec)
            delta = req.decoder.push(tok_id)
            matched = req.stop_state.feed(delta) if delta else None

            reason = self._check_stopping(req, tok_id, matched, now)
            if reason == StopReason.NOT_FINISHED:
                self._stream_progress(req, rec)
            else:
                req.stop_reason = reason
                if matched is not None and reason == StopReason.STOP_SEQUENCE:
                    req.matched_stop = matched
                self._finish(req, rec)

    def _check_stopping(self, req: GenRequest, tok_id: int, matched, now: float
                        ) -> StopReason:
        """Reference order (batcher.rs:757-784)."""
        if req.cancelled:
            return StopReason.CANCELLED
        if req.deadline is not None and now > req.deadline and req.generated_count >= 1:
            return StopReason.TIME_LIMIT
        if req.generated_count < req.stopping.min_new_tokens:
            return StopReason.NOT_FINISHED
        if tok_id == self.engine.eos_token_id:
            return StopReason.EOS_TOKEN
        if req.generated_count >= req.stopping.max_new_tokens:
            return (StopReason.TOKEN_LIMIT if req.stopping.max_is_token_limit
                    else StopReason.MAX_TOKENS)
        if matched is not None:
            return StopReason.STOP_SEQUENCE
        return StopReason.NOT_FINISHED

    # -- responses ----------------------------------------------------------

    def _emit_input_tokens(self, batch: list[GenRequest], details) -> None:
        for i, req in enumerate(batch):
            if not req.options.input_tokens:
                continue
            d = details[i]
            records = []
            for j in range(len(d["logprob"])):
                rec = TokenRecord(token_id=int(req.input_ids[j]))
                if req.options.token_logprobs:
                    rec.logprob = float(d["logprob"][j])
                if req.options.token_ranks:
                    rec.rank = int(d["rank"][j])
                if req.options.top_n_tokens and j > 0:
                    rec.top_tokens = self._top_n(
                        d["top_ids"][j], d["top_logprobs"][j],
                        d["top_scores"][j], req.options.top_n_tokens)
                records.append(rec)
            req.input_token_records = records
            if req.streaming and req.stream_queue is not None:
                req.stream_queue.put_nowait(("input_tokens", records))

    def _stream_progress(self, req: GenRequest, rec: TokenRecord) -> None:
        if not req.streaming or req.stream_queue is None:
            return
        text = req.unstreamed_text(final=False)
        req.stream_queue.put_nowait(("token", rec, text))

    def _finish(self, req: GenRequest, last_rec: Optional[TokenRecord]) -> None:
        # flush any held detokenizer state into the stop matcher
        if req.decoder is not None and req.stop_state is not None:
            tail = req.decoder.flush()
            if tail:
                m = req.stop_state.feed(tail)
                if m is not None and req.stop_reason == StopReason.STOP_SEQUENCE \
                        and req.matched_stop is None:
                    req.matched_stop = m
        if req.slot is not None:
            self.engine.free(req.slot)
            self.active.pop(req.slot, None)
            req.slot = None
        metrics.observe("tgi_request_generated_tokens", req.generated_count)
        metrics.observe("tgi_request_input_length", req.input_length)
        metrics.observe("tgi_request_total_tokens",
                        req.input_length + req.generated_count)
        if req.start_time is not None and req.generated_count > 0:
            inference_s = time.monotonic() - req.start_time
            metrics.observe("tgi_request_inference_duration", inference_s)
            metrics.observe("tgi_request_mean_time_per_token_duration",
                            inference_s / req.generated_count)
        if req.stop_reason == StopReason.CANCELLED:
            metrics.increment("tgi_request_cancelled")
        req.end_time = time.monotonic()
        # the per-request response log (with validation/queue/inference
        # timing and kind) is emitted by the servicer, matching the
        # reference's router-side log_response (grpc_server.rs:442-514)

        if req.streaming and req.stream_queue is not None:
            final_text = req.unstreamed_text(final=True)
            req.stream_queue.put_nowait(("final", last_rec, final_text, req.stop_reason))
        if req.result_future is not None and not req.result_future.done():
            req.result_future.set_result(req)

    # -- health -------------------------------------------------------------

    def loop_age(self) -> float:
        """Seconds since the batching loop last completed an iteration."""
        return time.monotonic() - self.last_tick

    async def health_probe(self, timeout: float = 5.0) -> bool:
        """Active liveness check: run a real 1-token dummy generation
        through the normal pipeline (reference: health.rs:53-82 falls back
        to a dummy Prefill when the generation-health flag is down). A
        wedged engine/executor thread makes this time out -> unhealthy."""
        from ..engine.engine import RequestParams

        req = GenRequest(
            input_text="", input_ids=[1],
            params=RequestParams(max_new_tokens=1),
            stopping=StoppingCriteria(max_new_tokens=1, min_new_tokens=0),
            options=ResponseOptions())
        try:
            self.submit(req)
        except QueueFullError:
            return False
        try:
            # submit() attached the future synchronously
            await asyncio.wait_for(asyncio.shield(req.result_future), timeout)
            return req.stop_reason != StopReason.ERROR
        except asyncio.TimeoutError:
            req.cancelled = True
            return False

    def _reap_cancelled_queued(self) -> None:
        """Prune cancelled AND deadline-expired entries from the queue
        (reference: queue.rs:198-227 — expired entries get an early
        TIME_LIMIT response with zero tokens; the ≥1-token guarantee only
        applies once generation has started)."""
        if not self.queue:
            return
        now = time.monotonic()
        keep = deque()
        for req in self.queue:
            if req.cancelled:
                req.stop_reason = StopReason.CANCELLED
                if req.result_future is not None and not req.result_future.done():
                    req.result_future.set_result(req)
            elif req.deadline is not None and now > req.deadline:
                metrics.increment("tgi_request_failure", reason="timeout")
                req.stop_reason = StopReason.TIME_LIMIT
                if req.streaming and req.stream_queue is not None:
                    req.stream_queue.put_nowait(
                        ("final", None, "", StopReason.TIME_LIMIT))
                if req.result_future is not None and not req.result_future.done():
                    req.result_future.set_result(req)
            else:
                keep.append(req)
        self.queue = keep

    def _fail_requests(self, reqs: list[GenRequest], message: str) -> None:
        """Complete the given requests as errored (no engine interaction)."""
        for req in reqs:
            req.error = message
            req.stop_reason = StopReason.ERROR
            if req.streaming and req.stream_queue is not None:
                req.stream_queue.put_nowait(("final", None, "", StopReason.ERROR))
            if req.result_future is not None and not req.result_future.done():
                req.result_future.set_result(req)

    def _fail_all(self, message: str, engine_reset: bool = False) -> None:
        reqs = list(self.active.values())
        self.active.clear()
        if engine_reset and hasattr(self.engine, "reset"):
            # device buffers are undefined: rebuild them (frees every slot)
            self.engine.reset()
            for req in reqs:
                req.slot = None
        else:
            for req in reqs:
                if req.slot is not None:
                    self.engine.free(req.slot)
                    req.slot = None
        self._fail_requests(reqs, message)
