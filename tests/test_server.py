"""End-to-end integration tests over real gRPC.

Mirrors the reference's integration suite structure (reference:
integration_tests/test_server.py): a live server (here: in-process asyncio on
a background thread, real gRPC on localhost), exercising unary + streaming
parity, batching, sampling seeds, stop sequences, token details, validation
errors, the Tokenize API, and the /metrics endpoint.
"""

import asyncio
import threading
import time
import urllib.request

import grpc
import numpy as np
import pytest

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.engine import InferenceEngine
from text_generation_inference_tpu.models import families
from text_generation_inference_tpu.pb import generation_pb2 as pb
from text_generation_inference_tpu.scheduler.batcher import Batcher
from text_generation_inference_tpu.server.grpc_server import (
    GenerationServicer,
    make_handler,
)
from text_generation_inference_tpu.server.http_server import serve_http
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer
from tests import fixtures


class ServerHandle:
    def __init__(self):
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        self.grpc_port = None
        self.http_port = None

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_forever()

    def submit(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.loop).result(timeout=120)

    async def _setup(self):
        model_dir = fixtures.tokenized_model_dir()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        tokenizer = ServingTokenizer.load(model_dir)
        self.config = ServingConfig(
            model_name=model_dir, max_sequence_length=64, max_new_tokens=32,
            max_batch_size=8, max_batch_slots=4, prefill_buckets=[16, 32],
            max_waiting_tokens=4,
        )
        self.config.validate()
        engine = InferenceEngine(spec, params, self.config, eos_token_id=2)
        self.batcher = Batcher(engine, tokenizer, self.config)
        self.batcher.start()
        servicer = GenerationServicer(self.config, tokenizer, self.batcher)
        server = grpc.aio.server()
        server.add_generic_rpc_handlers((make_handler(servicer),))
        self.grpc_port = server.add_insecure_port("127.0.0.1:0")
        await server.start()
        self.grpc_server = server
        http_server = await serve_http(self.batcher, 0)
        self.http_port = http_server.sockets[0].getsockname()[1]

    def start(self):
        self.submit(self._setup())


@pytest.fixture(scope="module")
def server():
    h = ServerHandle()
    h.start()
    yield h


@pytest.fixture(scope="module")
def stubs(server):
    channel = grpc.insecure_channel(f"127.0.0.1:{server.grpc_port}")

    class Stubs:
        generate = channel.unary_unary(
            "/fmaas.GenerationService/Generate",
            request_serializer=pb.BatchedGenerationRequest.SerializeToString,
            response_deserializer=pb.BatchedGenerationResponse.FromString)
        generate_stream = channel.unary_stream(
            "/fmaas.GenerationService/GenerateStream",
            request_serializer=pb.SingleGenerationRequest.SerializeToString,
            response_deserializer=pb.GenerationResponse.FromString)
        tokenize = channel.unary_unary(
            "/fmaas.GenerationService/Tokenize",
            request_serializer=pb.BatchedTokenizeRequest.SerializeToString,
            response_deserializer=pb.BatchedTokenizeResponse.FromString)
        model_info = channel.unary_unary(
            "/fmaas.GenerationService/ModelInfo",
            request_serializer=pb.ModelInfoRequest.SerializeToString,
            response_deserializer=pb.ModelInfoResponse.FromString)

    return Stubs


def greedy_params(max_new=8, **kw):
    return pb.Parameters(
        method=pb.GREEDY,
        stopping=pb.StoppingCriteria(max_new_tokens=max_new, **kw))


def gen_one(stubs, text, params):
    resp = stubs.generate(pb.BatchedGenerationRequest(
        model_id="m", requests=[pb.GenerationRequest(text=text)], params=params))
    assert len(resp.responses) == 1
    return resp.responses[0]


def stream_all(stubs, text, params, prefix_id=None):
    req = pb.SingleGenerationRequest(
        model_id="m", request=pb.GenerationRequest(text=text), params=params)
    return list(stubs.generate_stream(req))


PROMPT = "hello world this is a test"


class TestGenerate:
    def test_greedy_unary(self, stubs):
        r = gen_one(stubs, PROMPT, greedy_params(8))
        assert r.generated_token_count == 8
        assert r.stop_reason == pb.MAX_TOKENS
        assert r.input_token_count > 0
        assert isinstance(r.text, str)

    def test_greedy_deterministic(self, stubs):
        a = gen_one(stubs, PROMPT, greedy_params(8))
        b = gen_one(stubs, PROMPT, greedy_params(8))
        assert a.text == b.text

    def test_batched_unary(self, stubs):
        texts = ["hello world", "the quick brown fox", "testing one two"]
        resp = stubs.generate(pb.BatchedGenerationRequest(
            model_id="m",
            requests=[pb.GenerationRequest(text=t) for t in texts],
            params=greedy_params(6)))
        assert len(resp.responses) == 3
        singles = [gen_one(stubs, t, greedy_params(6)) for t in texts]
        for got, want in zip(resp.responses, singles):
            assert got.text == want.text

    def test_streaming_parity(self, stubs):
        unary = gen_one(stubs, PROMPT, greedy_params(10))
        msgs = stream_all(stubs, PROMPT, greedy_params(10))
        assert msgs[0].input_token_count == unary.input_token_count
        text = "".join(m.text for m in msgs[1:])
        assert text == unary.text
        assert msgs[-1].stop_reason == pb.MAX_TOKENS
        assert msgs[-1].generated_token_count == 10

    def test_input_text_option(self, stubs):
        p = greedy_params(4)
        p.response.input_text = True
        r = gen_one(stubs, PROMPT, p)
        assert r.text.startswith(PROMPT)


class TestSampling:
    def sample_params(self, seed=None, max_new=8):
        sp = pb.SamplingParameters(temperature=0.9, top_p=0.9)
        if seed is not None:
            sp.seed = seed
        return pb.Parameters(
            method=pb.SAMPLE, sampling=sp,
            stopping=pb.StoppingCriteria(max_new_tokens=max_new))

    def test_seeded_reproducible(self, stubs):
        a = gen_one(stubs, PROMPT, self.sample_params(seed=42))
        b = gen_one(stubs, PROMPT, self.sample_params(seed=42))
        assert a.text == b.text
        assert a.seed == 42

    def test_unseeded_returns_seed(self, stubs):
        r = gen_one(stubs, PROMPT, self.sample_params())
        assert r.seed > 0

    def test_multi_input_unique_seeds(self, stubs):
        resp = stubs.generate(pb.BatchedGenerationRequest(
            model_id="m",
            requests=[pb.GenerationRequest(text=PROMPT)] * 4,
            params=self.sample_params()))
        seeds = [r.seed for r in resp.responses]
        assert len(set(seeds)) == 4


class TestStopSequences:
    def test_stop_sequence_truncates(self, stubs):
        base = gen_one(stubs, PROMPT, greedy_params(12))
        if len(base.text) < 4:
            pytest.skip("generated text too short to carve a stop sequence")
        stop = base.text[2:4]
        p = greedy_params(12)
        p.stopping.stop_sequences.append(stop)
        r = gen_one(stubs, PROMPT, p)
        assert r.stop_reason == pb.STOP_SEQUENCE
        assert r.stop_sequence == stop
        assert r.text.endswith(stop)
        assert len(r.text) <= len(base.text)

    def test_exclude_stop_sequence(self, stubs):
        base = gen_one(stubs, PROMPT, greedy_params(12))
        if len(base.text) < 4:
            pytest.skip("generated text too short")
        stop = base.text[2:4]
        p = greedy_params(12)
        p.stopping.stop_sequences.append(stop)
        p.stopping.include_stop_sequence = False
        r = gen_one(stubs, PROMPT, p)
        assert r.stop_reason == pb.STOP_SEQUENCE
        assert not r.text.endswith(stop)

    def test_stream_stop_sequence_parity(self, stubs):
        base = gen_one(stubs, PROMPT, greedy_params(12))
        if len(base.text) < 4:
            pytest.skip("generated text too short")
        stop = base.text[2:4]
        p = greedy_params(12)
        p.stopping.stop_sequences.append(stop)
        unary = gen_one(stubs, PROMPT, p)
        msgs = stream_all(stubs, PROMPT, p)
        text = "".join(m.text for m in msgs[1:])
        assert text == unary.text
        assert msgs[-1].stop_reason == pb.STOP_SEQUENCE


class TestTokenDetails:
    def detail_params(self):
        p = greedy_params(5)
        p.response.generated_tokens = True
        p.response.token_logprobs = True
        p.response.token_ranks = True
        p.response.top_n_tokens = 2
        return p

    def test_generated_token_details(self, stubs):
        r = gen_one(stubs, PROMPT, self.detail_params())
        assert len(r.tokens) == 5
        for t in r.tokens:
            assert t.text
            assert t.logprob <= 0.0 or t.logprob != t.logprob
            assert t.rank >= 1
            assert 2 <= len(t.top_tokens) <= 8
        # greedy: chosen token must be rank 1 and match best top token
        assert r.tokens[0].rank == 1

    def test_input_token_details(self, stubs):
        p = greedy_params(3)
        p.response.input_tokens = True
        p.response.token_logprobs = True
        p.response.token_ranks = True
        r = gen_one(stubs, PROMPT, p)
        assert len(r.input_tokens) == r.input_token_count
        first = r.input_tokens[0]
        assert first.logprob != first.logprob  # NaN for first position
        for t in r.input_tokens[1:]:
            assert t.logprob <= 0.0
            assert t.rank >= 1

    def test_stream_token_details(self, stubs):
        msgs = stream_all(stubs, PROMPT, self.detail_params())
        token_msgs = [m for m in msgs if m.tokens]
        assert len(token_msgs) == 5


class TestLimits:
    def test_time_limit(self, stubs):
        p = greedy_params(32)
        p.stopping.time_limit_millis = 1
        r = gen_one(stubs, PROMPT, p)
        assert r.stop_reason == pb.TIME_LIMIT
        assert r.generated_token_count >= 1

    def test_token_limit_clamp(self, stubs, server):
        # input + max_new > max_sequence_length → clamped + TOKEN_LIMIT
        long_prompt = " ".join(["hello world the quick brown fox"] * 6)
        r = gen_one(stubs, long_prompt, greedy_params(32))
        assert r.stop_reason == pb.TOKEN_LIMIT
        assert r.input_token_count + r.generated_token_count == \
            server.config.max_sequence_length

    def test_min_new_tokens(self, stubs):
        p = greedy_params(8)
        p.stopping.min_new_tokens = 8
        r = gen_one(stubs, PROMPT, p)
        assert r.generated_token_count == 8


class TestValidationErrors:
    def expect_error(self, stubs, params, text=PROMPT, match=None):
        with pytest.raises(grpc.RpcError) as e:
            gen_one(stubs, text, params)
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        if match:
            assert match in e.value.details()
        return e.value

    def test_bad_temperature(self, stubs):
        p = pb.Parameters(
            method=pb.SAMPLE, sampling=pb.SamplingParameters(temperature=0.01),
            stopping=pb.StoppingCriteria(max_new_tokens=4))
        self.expect_error(stubs, p, match="temperature must be >= 0.05")

    def test_bad_top_p(self, stubs):
        p = pb.Parameters(
            method=pb.SAMPLE, sampling=pb.SamplingParameters(top_p=1.5),
            stopping=pb.StoppingCriteria(max_new_tokens=4))
        self.expect_error(stubs, p, match="top_p")

    def test_sampling_params_in_greedy(self, stubs):
        p = pb.Parameters(
            method=pb.GREEDY, sampling=pb.SamplingParameters(temperature=0.9),
            stopping=pb.StoppingCriteria(max_new_tokens=4))
        self.expect_error(stubs, p, match="greedy")

    def test_max_new_tokens_too_big(self, stubs):
        self.expect_error(stubs, greedy_params(1000), match="max_new_tokens")

    def test_min_gt_max(self, stubs):
        p = greedy_params(4)
        p.stopping.min_new_tokens = 10
        self.expect_error(stubs, p, match="min_new_tokens")

    def test_too_many_stop_seqs(self, stubs):
        p = greedy_params(4)
        for i in range(7):
            p.stopping.stop_sequences.append(f"s{i}")
        self.expect_error(stubs, p, match="stop sequences")

    def test_token_detail_without_tokens(self, stubs):
        p = greedy_params(4)
        p.response.token_logprobs = True
        self.expect_error(stubs, p, match="token detail")

    def test_input_too_long(self, stubs):
        long_prompt = " ".join(["hello world the quick brown fox jumps"] * 12)
        self.expect_error(stubs, greedy_params(4), text=long_prompt)


class TestTokenizeApi:
    def test_token_count(self, stubs):
        resp = stubs.tokenize(pb.BatchedTokenizeRequest(
            model_id="m", requests=[pb.TokenizeRequest(text=PROMPT)]))
        assert resp.responses[0].token_count > 0
        assert not resp.responses[0].tokens

    def test_return_tokens_and_offsets(self, stubs):
        resp = stubs.tokenize(pb.BatchedTokenizeRequest(
            model_id="m", requests=[pb.TokenizeRequest(text=PROMPT)],
            return_tokens=True, return_offsets=True))
        r = resp.responses[0]
        assert len(r.tokens) == r.token_count
        assert len(r.offsets) == r.token_count
        assert r.offsets[0].start == 0

    def test_truncate(self, stubs):
        resp = stubs.tokenize(pb.BatchedTokenizeRequest(
            model_id="m", requests=[pb.TokenizeRequest(text=PROMPT)],
            truncate_input_tokens=2, return_tokens=True))
        assert resp.responses[0].token_count == 2


class TestModelInfo:
    def test_model_info(self, stubs, server):
        r = stubs.model_info(pb.ModelInfoRequest(model_id="m"))
        assert r.model_kind == pb.ModelInfoResponse.ModelKind.DECODER_ONLY
        assert r.max_sequence_length == server.config.max_sequence_length
        assert r.max_new_tokens == server.config.max_new_tokens


class TestConcurrency:
    def test_concurrent_mixed_requests(self, stubs):
        """Staggered unary + streaming concurrency exercising add-on prefills
        (reference: test_server.py:261-299)."""
        import concurrent.futures

        texts = ["hello world", "the quick brown fox", "testing one two three",
                 "streaming text generation"]
        expected = {t: gen_one(stubs, t, greedy_params(8)).text for t in texts}

        def unary(t):
            time.sleep(np.random.default_rng(hash(t) % 1000).uniform(0, 0.2))
            return t, gen_one(stubs, t, greedy_params(8)).text

        def stream(t):
            time.sleep(np.random.default_rng(hash(t) % 999).uniform(0, 0.2))
            msgs = stream_all(stubs, t, greedy_params(8))
            return t, "".join(m.text for m in msgs[1:])

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            futures = [pool.submit(unary, t) for t in texts]
            futures += [pool.submit(stream, t) for t in texts]
            for fut in concurrent.futures.as_completed(futures):
                t, text = fut.result()
                assert text == expected[t], f"concurrent output diverged for {t!r}"


class TestHttpEndpoints:
    def test_health(self, server):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.http_port}/health") as resp:
            assert resp.status == 200

    def test_metrics(self, server, stubs):
        gen_one(stubs, PROMPT, greedy_params(2))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.http_port}/metrics") as resp:
            body = resp.read().decode()
        assert "tgi_request_count" in body
        assert "tgi_request_success_total" in body
        assert "tgi_batch_inference_duration" in body

    # the reference README's full metrics table, minus the two series
    # absorbed by design (documented in proto/CONTRACT.md):
    # tgi_batch_concatenation_count (slot/paged engines never concatenate
    # batches) and tgi_granular_batch_addition (page-budget admission
    # replaces the granular weight analysis).
    REFERENCE_SERIES = [
        "tgi_request_count",
        "tgi_request_input_count",
        "tgi_request_failure",
        "tgi_request_success",
        "tgi_request_max_new_tokens",
        "tgi_request_input_length",
        "tgi_request_raw_input_length",
        "tgi_request_mean_time_per_token_duration",
        "tgi_request_validation_duration",
        "tgi_request_queue_duration",
        "tgi_request_generated_tokens",
        "tgi_request_total_tokens",
        "tgi_request_duration",
        "tgi_request_inference_duration",
        "tgi_batch_inference_count",
        "tgi_batch_inference_success",
        "tgi_batch_inference_failure",
        "tgi_batch_inference_batch_size",
        "tgi_batch_inference_duration",
        "tgi_batch_inference_forward_duration",
        "tgi_batch_inference_tokproc_duration",
        "tgi_batch_next_tokens",
        "tgi_batch_current_size",
        "tgi_batch_input_tokens",
        "tgi_batch_max_remaining_tokens",
        "tgi_queue_size",
        "tgi_queue_jump",
        "tgi_prefill_weight_limit_exceeded",
        "tgi_prefill_padding_limit_exceeded",
        "tgi_prompt_load_failure",
        "tgi_prompt_load_duration",
        "tgi_tokenize_request_count",
        "tgi_tokenize_request_input_count",
        "tgi_tokenize_request_tokens",
        "tgi_tokenize_request_duration",
    ]

    def test_metrics_reference_table_parity(self, server, stubs):
        """Mixed workload, then assert every series from the reference
        README metrics table is present (reference: README.md 'Metrics')."""
        # unary single + batch + stream + tokenize + a validation failure
        gen_one(stubs, PROMPT, greedy_params(3))
        stubs.generate(pb.BatchedGenerationRequest(
            model_id="m",
            requests=[pb.GenerationRequest(text=PROMPT),
                      pb.GenerationRequest(text=PROMPT)],
            params=greedy_params(3)))
        list(stubs.generate_stream(pb.SingleGenerationRequest(
            model_id="m", request=pb.GenerationRequest(text=PROMPT),
            params=greedy_params(3))))
        stubs.tokenize(pb.BatchedTokenizeRequest(
            model_id="m", requests=[pb.TokenizeRequest(text=PROMPT)]))
        with pytest.raises(grpc.RpcError):
            gen_one(stubs, PROMPT, pb.Parameters(
                method=pb.SAMPLE,
                sampling=pb.SamplingParameters(temperature=0.01)))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.http_port}/metrics") as resp:
            body = resp.read().decode()
        missing = [s for s in self.REFERENCE_SERIES
                   if f"\n{s}" not in body and not body.startswith(s)
                   and f"TYPE {s} " not in body]
        assert not missing, f"missing reference metric series: {missing}"
        # label parity spot checks
        assert 'method="prefill"' in body and 'method="next_token"' in body
        assert 'kind="single"' in body and 'kind="stream"' in body
        assert 'kind="batch"' in body
        assert 'stop_reason="MAX_TOKENS"' in body
