"""generate.v1.TextGenerationService — the reference's internal router↔shard
API served over the TPU engine.

The native deployment of this framework has no router↔shard split (the
single-controller engine absorbs it; proto/CONTRACT.md documents the
mapping), but the reference's Rust router speaks this exact wire surface
(reference: proto/generate.proto; server implementation
server/text_generation_server/server.py:105-249). Serving it makes the TPU
engine a drop-in shard: the router drives the batch state machine with
explicit batch ids — Prefill creates a batch and returns every request's
first token, NextToken takes the surviving batches (completed requests
named by `completed_ids` deltas), merges them, and advances one token,
PruneBatch drops finished requests without generating.

The compatibility layer maps batch ids onto engine slots:

  * a batch is a host-side dict {request_id: slot} plus per-request detail
    flags — the engine's slot state IS the reference's cached Batch (KV
    included), so `concatenate` is a dict union and `prune` frees slots
    (the reference's tensor re-padding work has no equivalent: nothing is
    reshaped, reference causal_lm.py:218-545);
  * NextToken decodes a single step (chunk=1) across all slots and reads
    out the rows of the batches' surviving requests, preserving request
    order across merged batches like the reference's concatenate.

Start with `text-generation-server-tpu serve <model> --internal-api` (or
INTERNAL_API=1): the process then serves generate.v1 INSTEAD of fmaas,
exactly like a reference shard process.
"""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Optional

import grpc
import grpc.aio
import numpy as np

from ..config import ServingConfig
from ..engine.engine import EngineDeviceError, RequestParams
from ..pb import generate_pb2 as pb
from ..utils import metrics

logger = logging.getLogger(__name__)

_FULL_NAME = "generate.v1.TextGenerationService"


class _ReqState:
    __slots__ = ("req_id", "slot", "logprobs", "ranks", "top_n")

    def __init__(self, req_id: int, slot: int, logprobs: bool, ranks: bool,
                 top_n: int):
        self.req_id = req_id
        self.slot = slot
        self.logprobs = logprobs
        self.ranks = ranks
        self.top_n = top_n


class InternalTextGenerationService:
    """grpc.aio servicer implementing generate.v1 over an engine."""

    def __init__(self, engine, tokenizer, config: ServingConfig,
                 prompt_cache=None, model_kind: str = "decoder"):
        self.engine = engine
        self.tokenizer = tokenizer
        self.config = config
        self.prompt_cache = prompt_cache
        self.model_kind = model_kind
        # batch cache: the reference's cache.py — batch_id -> ordered reqs
        self.batches: dict[int, list[_ReqState]] = {}
        # engine calls are serialized (the reference shard is likewise a
        # single-threaded asyncio servicer, server.py)
        self._lock = asyncio.Lock()

    # -- helpers -----------------------------------------------------------

    def _request_params(self, p: pb.NextTokenChooserParameters,
                        max_new: int) -> RequestParams:
        lp = p.length_penalty if p.HasField("length_penalty") else None
        return RequestParams(
            temperature=p.temperature,
            top_k=p.top_k,
            top_p=p.top_p if p.top_p else 1.0,
            typical_p=p.typical_p if p.typical_p else 1.0,
            seed=p.seed if p.HasField("seed") else 0,
            repetition_penalty=(p.repetition_penalty
                                if p.HasField("repetition_penalty") else 1.0),
            lp_start=lp.start_index if lp else 0,
            lp_decay=lp.decay_factor if lp else 0.0,
            min_new_tokens=p.min_new_tokens,
            max_new_tokens=max_new,
        )

    def _token_pb(self, rs: _ReqState, step, row: int) -> pb.Token:
        t = pb.Token(request_id=rs.req_id,
                     token_id=int(step.next_ids[row]))
        if rs.logprobs:
            lp = float(step.logprob[row])
            t.logprob = 0.0 if np.isnan(lp) else lp
        if rs.ranks:
            t.rank = int(step.rank[row])
        if rs.top_n:
            n = min(rs.top_n, len(step.top_ids[row]))
            nth = step.top_scores[row][n - 1]
            for i in range(min(len(step.top_ids[row]), 4 * n)):
                if step.top_scores[row][i] < nth \
                        or step.top_scores[row][i] == -np.inf:
                    break
                t.top_tokens.append(pb.TopToken(
                    token_id=int(step.top_ids[row][i]),
                    logprob=float(step.top_logprobs[row][i])))
        return t

    def _apply_status(self, batch_id: int,
                      status: Optional[pb.RequestsStatus]) -> list[_ReqState]:
        """Pop a cached batch, free completed requests' slots, return the
        survivors in order (the reference's prune,
        server.py:189-199 + model.py get_indices_to_keep)."""
        reqs = self.batches.pop(batch_id, [])
        if status is None:
            return reqs
        done = set(status.completed_ids)
        keep = []
        for rs in reqs:
            if rs.req_id in done:
                self.engine.free(rs.slot)
            else:
                keep.append(rs)
        return keep

    # -- RPCs --------------------------------------------------------------

    async def ServiceDiscovery(self, request, context):
        return pb.ServiceDiscoveryResponse(urls=[])

    async def Health(self, request, context):
        return pb.HealthResponse()

    async def ClearCache(self, request, context):
        async with self._lock:
            for reqs in self.batches.values():
                for rs in reqs:
                    self.engine.free(rs.slot)
            self.batches.clear()
        return pb.ClearCacheResponse()

    async def ModelInfo(self, request, context):
        from ..engine.memory import device_hbm_bytes, tree_bytes

        spec = self.engine.spec
        # analytic memory scaling model (the reference FITS these empirically
        # at startup, memory_characterizer.py:496-539; HBM use on TPU is
        # predictable from static shapes so the coefficients are closed-form):
        #   next-token mem ≈ kv_per_token · b·in + kv_per_token · b·out
        #   prefill mem ≈ act_per_token · b·s (+ scores quadratic term)
        item = 2  # bf16 activations
        kv_per_token = (spec.num_layers * 2 * spec.num_kv_heads
                        * spec.head_dim * item)
        act_per_token = (spec.hidden_size * 6
                         + getattr(spec, "intermediate_size", 0) * 2) * item
        score_quad = spec.num_heads * 4  # f32 score matrix per token^2
        params_b = tree_bytes(self.engine.model_params)
        free_b = max(0, device_hbm_bytes() - params_b)
        msm = pb.MemoryScalingModel(
            prefill_linear_coef0=float(act_per_token),
            prefill_quadratic_coef0=float(act_per_token),
            prefill_quadratic_coef1=float(score_quad),
            nexttoken_linear_coef0=float(kv_per_token),
            nexttoken_linear_coef1=float(kv_per_token),
            weight_limit=int(free_b
                             * (1 - self.config.batch_safety_margin)),
        )
        return pb.ModelInfoResponse(
            model_type=(pb.ModelInfoResponse.SEQ2SEQ_LM
                        if self.model_kind == "encoder_decoder"
                        else pb.ModelInfoResponse.CAUSAL_LM),
            eos_token=self.engine.eos_token_id,
            batch_padding=True,   # bucket-padded prefill (no varlen ragged)
            memory_scaling_model=msm,
        )

    async def PrefixLookup(self, request, context):
        if self.prompt_cache is None:
            await context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                                "no prefix store configured")
        try:
            entry = self.prompt_cache.get_entry(request.prefix_id)
        except Exception as e:  # noqa: BLE001 - surface as NOT_FOUND
            await context.abort(grpc.StatusCode.NOT_FOUND, str(e))
        length = getattr(entry, "length", None)
        if length is None:
            dec = getattr(entry, "decoder", entry)
            length = int(dec.shape[0])
        return pb.PrefixLookupResponse(prefix_length=length)

    async def Prefill(self, request, context):
        async with self._lock:
            try:
                return await self._prefill_locked(request, context)
            except EngineDeviceError:
                logger.exception("internal Prefill device failure; reset")
                self.batches.clear()
                self.engine.reset()
                await context.abort(grpc.StatusCode.INTERNAL,
                                    "device failure (engine reset)")

    async def _prefill_locked(self, request, context):
        batch = request.batch
        for cached in request.to_prune:
            survivors = self._apply_status(
                cached.batch_id,
                cached.status if cached.HasField("status") else None)
            if survivors:
                self.batches[cached.batch_id] = survivors
        t0 = time.monotonic_ns()
        reqs = list(batch.requests)
        if not reqs:
            await context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                                "empty batch")
        token_ids = []
        states: list[_ReqState] = []
        params: list[RequestParams] = []
        prefix_embeds = []
        any_prefix = False
        for r in reqs:
            ids = self.tokenizer.encode(r.inputs)
            if r.truncate and len(ids) > r.input_length:
                ids = ids[len(ids) - r.input_length:]  # keep the tail
            slot = self.engine.acquire_slot()
            if slot is None:
                for rs in states:
                    self.engine.free(rs.slot)
                await context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                                    "no free slots")
            d = r.details
            states.append(_ReqState(r.id, slot, d.logprobs, d.ranks,
                                    d.top_n_toks))
            token_ids.append(ids)
            params.append(self._request_params(r.parameters,
                                               r.max_output_length))
            pe = None
            if r.prefix_id and self.prompt_cache is not None:
                pe = self.prompt_cache.get_entry(r.prefix_id)
                any_prefix = True
            prefix_embeds.append(pe)
        want_input = any(r.details.input_toks for r in reqs)
        result = self.engine.prefill(
            [rs.slot for rs in states], token_ids, params,
            want_prompt_details=want_input,
            prefix_embeds=prefix_embeds if any_prefix else None)
        self.batches[batch.id] = states
        metrics.increment("tgi_batch_inference_count", method="prefill")

        out = pb.PrefillResponse(result=pb.GenerateResult(
            batch_id=batch.id,
            forward_time_ns=self.engine.last_forward_ns or
            (time.monotonic_ns() - t0)))
        for i, rs in enumerate(states):
            out.result.output_tokens.append(
                self._token_pb(rs, result.first_token, i))
        if want_input and result.prompt_details is not None:
            for i, (r, rs) in enumerate(zip(reqs, states)):
                if not r.details.input_toks:
                    continue
                d = result.prompt_details[i]
                it = pb.InputTokens(request_id=rs.req_id)
                for j in range(len(d["logprob"])):
                    tok = pb.Token(request_id=rs.req_id,
                                   token_id=int(token_ids[i][j]))
                    if rs.logprobs:
                        lp = float(d["logprob"][j])
                        tok.logprob = 0.0 if np.isnan(lp) else lp
                    if rs.ranks:
                        tok.rank = int(d["rank"][j])
                    it.tokens.append(tok)
                out.input_tokens.append(it)
        return out

    async def NextToken(self, request, context):
        async with self._lock:
            try:
                return await self._next_token_locked(request, context)
            except EngineDeviceError:
                logger.exception("internal NextToken device failure; reset")
                self.batches.clear()
                self.engine.reset()
                await context.abort(grpc.StatusCode.INTERNAL,
                                    "device failure (engine reset)")

    async def _next_token_locked(self, request, context):
        merged: list[_ReqState] = []
        first_id = None
        for cached in request.batches:
            survivors = self._apply_status(
                cached.batch_id,
                cached.status if cached.HasField("status") else None)
            if survivors and first_id is None:
                first_id = cached.batch_id
            merged.extend(survivors)
        if not merged:
            return pb.NextTokenResponse()
        if self.batches:
            # the engine advances every active slot per step, so a call
            # that omits a live batch would silently advance it too; the
            # reference router always passes every live batch (its
            # batching_task maintains one combined batch,
            # router/src/batcher.rs:399-570), so this is a caller bug
            stale = sorted(self.batches)
            self.batches[first_id] = merged   # restore before aborting
            await context.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                f"NextToken must include every live batch; missing {stale}")
        want = any(rs.logprobs or rs.ranks or rs.top_n for rs in merged)
        steps = self.engine.decode_steps(want_details=want, chunk=1)
        step = steps[0]
        self.batches[first_id] = merged
        metrics.increment("tgi_batch_inference_count", method="next_token")
        result = pb.GenerateResult(
            batch_id=first_id, forward_time_ns=self.engine.last_forward_ns)
        for rs in merged:
            result.output_tokens.append(self._token_pb(rs, step, rs.slot))
        return pb.NextTokenResponse(result=result)

    async def PruneBatch(self, request, context):
        async with self._lock:
            cached = request.batch
            survivors = self._apply_status(
                cached.batch_id,
                cached.status if cached.HasField("status") else None)
            if not survivors:
                return pb.PruneBatchResponse()
            self.batches[cached.batch_id] = survivors
            return pb.PruneBatchResponse(batch_id=cached.batch_id)


def _add_servicer(server, servicer) -> None:
    """Register without generated service stubs (matching the repo's
    raw-handler style in grpc_server.py)."""
    rpcs = {
        "ServiceDiscovery": (pb.ServiceDiscoveryRequest,
                             pb.ServiceDiscoveryResponse),
        "ClearCache": (pb.ClearCacheRequest, pb.ClearCacheResponse),
        "ModelInfo": (pb.ModelInfoRequest, pb.ModelInfoResponse),
        "Prefill": (pb.PrefillRequest, pb.PrefillResponse),
        "NextToken": (pb.NextTokenRequest, pb.NextTokenResponse),
        "PruneBatch": (pb.PruneBatchRequest, pb.PruneBatchResponse),
        "PrefixLookup": (pb.PrefixLookupRequest, pb.PrefixLookupResponse),
        "Health": (pb.HealthRequest, pb.HealthResponse),
    }
    handlers = {
        name: grpc.unary_unary_rpc_method_handler(
            getattr(servicer, name),
            request_deserializer=req.FromString,
            response_serializer=resp.SerializeToString)
        for name, (req, resp) in rpcs.items()
    }
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(_FULL_NAME, handlers),))


async def serve_internal_grpc(servicer: InternalTextGenerationService,
                              config: ServingConfig) -> grpc.aio.Server:
    server = grpc.aio.server()
    _add_servicer(server, servicer)
    if config.uds_path:
        addr = f"unix://{config.uds_path}"
    else:
        addr = f"[::]:{config.grpc_port}"
    server.add_insecure_port(addr)
    await server.start()
    logger.info("generate.v1 internal API listening on %s", addr)
    return server
