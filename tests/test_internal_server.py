"""generate.v1 internal API (the reference's router↔shard wire surface)
served over the slot engine — drive it exactly like the reference's router
does: Prefill → NextToken loop with completed_ids deltas, add-on batch
merging, PruneBatch (reference: proto/generate.proto + server.py:105-249).
"""

import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

from tests import fixtures
from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.engine import (InferenceEngine,
                                                         RequestParams)
from text_generation_inference_tpu.models import families
from text_generation_inference_tpu.pb import generate_pb2 as pb
from text_generation_inference_tpu.server.internal_server import (
    InternalTextGenerationService)
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer


class AbortError(Exception):
    def __init__(self, code, details):
        self.code, self.details = code, details


class FakeContext:
    async def abort(self, code, details):
        raise AbortError(code, details)


@pytest.fixture(scope="module")
def served():
    model_dir = fixtures.tokenized_model_dir()
    spec, params = families.load_model(model_dir, dtype=jnp.float32)
    tok = ServingTokenizer.load(model_dir)
    return model_dir, spec, params, tok


def make_service(served, slots=4):
    _, spec, params, tok = served
    cfg = ServingConfig(
        max_sequence_length=64, max_new_tokens=32, max_batch_slots=slots,
        prefill_buckets=[8, 16, 32], decode_chunk=1)
    cfg.validate()
    engine = InferenceEngine(spec, params, cfg, eos_token_id=2)
    return InternalTextGenerationService(engine, tok, cfg), engine


def prefill_req(batch_id, reqs, to_prune=()):
    return pb.PrefillRequest(
        batch=pb.Batch(id=batch_id, requests=reqs),
        to_prune=list(to_prune))


def mkreq(rid, text, max_out=8, logprobs=False, input_toks=False, top_n=0,
          **params):
    return pb.Request(
        id=rid, inputs=text, max_output_length=max_out,
        parameters=pb.NextTokenChooserParameters(**params),
        details=pb.RequestedDetails(logprobs=logprobs, ranks=logprobs,
                                    input_toks=input_toks,
                                    top_n_toks=top_n))


def run(coro):
    return asyncio.run(coro)


def engine_direct(served, prompt_text, n_tokens):
    """Greedy-decode via the engine directly (the parity oracle)."""
    _, spec, params, tok = served
    cfg = ServingConfig(
        max_sequence_length=64, max_new_tokens=32, max_batch_slots=4,
        prefill_buckets=[8, 16, 32], decode_chunk=1)
    cfg.validate()
    eng = InferenceEngine(spec, params, cfg, eos_token_id=2)
    ids = tok.encode(prompt_text)
    s = eng.acquire_slot()
    res = eng.prefill([s], [ids], [RequestParams(max_new_tokens=n_tokens)])
    out = [int(res.first_token.next_ids[0])]
    while len(out) < n_tokens:
        out.append(int(eng.decode_steps(chunk=1)[0].next_ids[s]))
    return out


class TestPrefillNextToken:
    def test_single_request_stream_matches_engine(self, served):
        svc, _ = make_service(served)
        ctx = FakeContext()

        async def go():
            resp = await svc.Prefill(
                prefill_req(1, [mkreq(10, "hello world this is", 8)]), ctx)
            toks = [resp.result.output_tokens[0].token_id]
            assert resp.result.batch_id == 1
            assert resp.result.forward_time_ns > 0
            cached = pb.CachedBatch(batch_id=1,
                                    status=pb.RequestsStatus(completed_ids=[]))
            while len(toks) < 8:
                r = await svc.NextToken(
                    pb.NextTokenRequest(batches=[cached]), ctx)
                toks.append(r.result.output_tokens[0].token_id)
            return toks

        toks = run(go())
        assert toks == engine_direct(served, "hello world this is", 8)

    def test_addon_batch_merge_and_prune(self, served):
        """The reference router's flow: prefill b1, decode a few, prefill b2
        (add-on), NextToken([b1, b2]) merges, completed_ids prune one."""
        svc, engine = make_service(served)
        ctx = FakeContext()
        oracle_a = engine_direct(served, "the quick brown", 8)
        oracle_b = engine_direct(served, "testing one two", 6)

        async def go():
            r1 = await svc.Prefill(
                prefill_req(1, [mkreq(100, "the quick brown", 8)]), ctx)
            toks_a = [r1.result.output_tokens[0].token_id]
            cb1 = pb.CachedBatch(batch_id=1, status=pb.RequestsStatus())
            for _ in range(2):
                r = await svc.NextToken(pb.NextTokenRequest(batches=[cb1]),
                                        ctx)
                toks_a.append(r.result.output_tokens[0].token_id)
            r2 = await svc.Prefill(
                prefill_req(2, [mkreq(200, "testing one two", 6)]), ctx)
            toks_b = [r2.result.output_tokens[0].token_id]
            # merged decoding: one NextToken advances both
            merged = pb.NextTokenRequest(batches=[
                pb.CachedBatch(batch_id=1, status=pb.RequestsStatus()),
                pb.CachedBatch(batch_id=2, status=pb.RequestsStatus()),
            ])
            r = await svc.NextToken(merged, ctx)
            by_id = {t.request_id: t.token_id for t in r.result.output_tokens}
            toks_a.append(by_id[100])
            toks_b.append(by_id[200])
            new_id = r.result.batch_id
            cbm = pb.CachedBatch(batch_id=new_id, status=pb.RequestsStatus())
            for _ in range(4):
                r = await svc.NextToken(pb.NextTokenRequest(batches=[cbm]),
                                        ctx)
                by_id = {t.request_id: t.token_id
                         for t in r.result.output_tokens}
                toks_a.append(by_id[100])
                toks_b.append(by_id[200])
            # request 100 done (8 tokens): prune via completed_ids
            cbm = pb.CachedBatch(
                batch_id=new_id,
                status=pb.RequestsStatus(completed_ids=[100]))
            r = await svc.NextToken(pb.NextTokenRequest(batches=[cbm]), ctx)
            assert [t.request_id for t in r.result.output_tokens] == [200]
            return toks_a, toks_b

        toks_a, toks_b = run(go())
        assert toks_a == oracle_a
        assert toks_b[:6] == oracle_b
        # pruning freed the slot
        assert engine.num_active == 1

    def test_prune_batch(self, served):
        svc, engine = make_service(served)
        ctx = FakeContext()

        async def go():
            await svc.Prefill(prefill_req(
                7, [mkreq(1, "a b", 4), mkreq(2, "c d", 4)]), ctx)
            r = await svc.PruneBatch(pb.PruneBatchRequest(
                batch=pb.CachedBatch(
                    batch_id=7,
                    status=pb.RequestsStatus(completed_ids=[1]))), ctx)
            assert r.HasField("batch_id") and r.batch_id == 7
            r = await svc.PruneBatch(pb.PruneBatchRequest(
                batch=pb.CachedBatch(
                    batch_id=7,
                    status=pb.RequestsStatus(completed_ids=[2]))), ctx)
            assert not r.HasField("batch_id")

        run(go())
        assert engine.num_active == 0

    def test_next_token_requires_all_live_batches(self, served):
        svc, _ = make_service(served)
        ctx = FakeContext()

        async def go():
            await svc.Prefill(prefill_req(1, [mkreq(1, "a b", 4)]), ctx)
            await svc.Prefill(prefill_req(2, [mkreq(2, "c d", 4)]), ctx)
            with pytest.raises(AbortError, match="every live batch"):
                await svc.NextToken(pb.NextTokenRequest(batches=[
                    pb.CachedBatch(batch_id=1, status=pb.RequestsStatus())]),
                    ctx)

        run(go())

    def test_details_and_input_tokens(self, served):
        svc, _ = make_service(served)
        ctx = FakeContext()

        async def go():
            resp = await svc.Prefill(prefill_req(
                1, [mkreq(5, "hello world", 4, logprobs=True,
                          input_toks=True, top_n=2)]), ctx)
            t = resp.result.output_tokens[0]
            assert t.logprob < 0 and t.rank >= 1
            assert len(t.top_tokens) >= 2
            assert len(resp.input_tokens) == 1
            it = resp.input_tokens[0].tokens
            assert len(it) >= 2
            assert it[0].logprob == 0.0     # first prompt token: no prediction
            assert it[1].logprob < 0

        run(go())

    def test_truncation_keeps_tail(self, served):
        svc, _ = make_service(served)
        _, _, _, tok = served
        ctx = FakeContext()
        text = "hello world this is a test of the tokenizer"
        full = tok.encode(text)

        async def go():
            r = pb.Request(
                id=1, inputs=text, input_length=3, truncate=True,
                max_output_length=4,
                parameters=pb.NextTokenChooserParameters(),
                details=pb.RequestedDetails())
            resp = await svc.Prefill(prefill_req(1, [r]), ctx)
            return resp.result.output_tokens[0].token_id

        got = run(go())
        # oracle: engine on the LAST 3 tokens
        _, spec, params, _ = served
        cfg = ServingConfig(max_sequence_length=64, max_new_tokens=32,
                            max_batch_slots=4, prefill_buckets=[8, 16],
                            decode_chunk=1)
        cfg.validate()
        eng = InferenceEngine(spec, params, cfg, eos_token_id=2)
        s = eng.acquire_slot()
        res = eng.prefill([s], [full[-3:]], [RequestParams(max_new_tokens=4)])
        assert got == int(res.first_token.next_ids[0])


class TestAdminRPCs:
    def test_model_info(self, served):
        svc, engine = make_service(served)

        async def go():
            return await svc.ModelInfo(pb.ModelInfoRequest(), FakeContext())

        info = run(go())
        assert info.model_type == pb.ModelInfoResponse.CAUSAL_LM
        assert info.eos_token == 2
        assert info.batch_padding is True
        assert info.memory_scaling_model.weight_limit > 0
        assert info.memory_scaling_model.nexttoken_linear_coef0 > 0

    def test_health_discovery_clear(self, served):
        svc, engine = make_service(served)
        ctx = FakeContext()

        async def go():
            await svc.Health(pb.HealthRequest(), ctx)
            d = await svc.ServiceDiscovery(pb.ServiceDiscoveryRequest(), ctx)
            assert list(d.urls) == []
            await svc.Prefill(prefill_req(1, [mkreq(1, "a b", 4)]), ctx)
            assert engine.num_active == 1
            await svc.ClearCache(pb.ClearCacheRequest(), ctx)

        run(go())
        assert engine.num_active == 0
        assert svc.batches == {}


class TestWire:
    def test_grpc_roundtrip(self, served):
        """One Prefill + NextToken over a real gRPC socket (the surface the
        reference's Rust router would dial)."""
        import grpc

        from text_generation_inference_tpu.server.internal_server import (
            serve_internal_grpc)

        model_dir, spec, params, tok = served
        oracle = engine_direct(served, "hello world", 3)

        async def go():
            cfg = ServingConfig(
                max_sequence_length=64, max_new_tokens=32, max_batch_slots=2,
                prefill_buckets=[8, 16], decode_chunk=1, grpc_port=0)
            cfg.validate()
            import socket

            with socket.socket() as s:
                s.bind(("localhost", 0))
                cfg.grpc_port = s.getsockname()[1]
            engine = InferenceEngine(spec, params, cfg, eos_token_id=2)
            svc = InternalTextGenerationService(engine, tok, cfg)
            server = await serve_internal_grpc(svc, cfg)
            async with grpc.aio.insecure_channel(
                    f"localhost:{cfg.grpc_port}") as ch:
                prefill = ch.unary_unary(
                    "/generate.v1.TextGenerationService/Prefill",
                    request_serializer=pb.PrefillRequest.SerializeToString,
                    response_deserializer=pb.PrefillResponse.FromString)
                nt = ch.unary_unary(
                    "/generate.v1.TextGenerationService/NextToken",
                    request_serializer=pb.NextTokenRequest.SerializeToString,
                    response_deserializer=pb.NextTokenResponse.FromString)
                resp = await prefill(prefill_req(
                    1, [mkreq(1, "hello world", 3)]))
                toks = [resp.result.output_tokens[0].token_id]
                for _ in range(2):
                    r = await nt(pb.NextTokenRequest(batches=[
                        pb.CachedBatch(batch_id=1,
                                       status=pb.RequestsStatus())]))
                    toks.append(r.result.output_tokens[0].token_id)
            await server.stop(grace=1)
            return toks

        assert asyncio.run(go()) == oracle
