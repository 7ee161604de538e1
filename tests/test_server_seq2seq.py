"""Seq2seq (T5) serving end-to-end: engine + batcher + gRPC.

Mirrors the reference's mt0-small integration coverage (reference:
integration_tests/test_cases_mt0small.yaml) with a tiny random T5.
"""

import asyncio
import shutil
import threading

import grpc
import pytest
import torch

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine
from text_generation_inference_tpu.models import t5
from text_generation_inference_tpu.pb import generation_pb2 as pb
from text_generation_inference_tpu.scheduler.batcher import Batcher
from text_generation_inference_tpu.server.grpc_server import (
    GenerationServicer,
    make_handler,
)
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer
from text_generation_inference_tpu.utils.weights import Weights
from tests import fixtures


def build_t5_fixture():
    import json

    from tokenizers import Tokenizer
    from transformers import T5Config, T5ForConditionalGeneration

    tok_file = fixtures.tiny_tokenizer_file()
    vocab = Tokenizer.from_file(tok_file).get_vocab_size()
    name = "tiny_t5_served"
    out = fixtures.FIXTURE_ROOT / name
    if not (out / "config.json").exists():
        torch.manual_seed(8)
        cfg = T5Config(
            vocab_size=vocab, d_model=64, d_kv=16, d_ff=128, num_layers=2,
            num_decoder_layers=2, num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=32,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            dropout_rate=0.0, decoder_start_token_id=0, eos_token_id=1,
            pad_token_id=0)
        fixtures._save(T5ForConditionalGeneration(cfg).eval(), name)
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


class S2SServer:
    def __init__(self):
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_forever()

    def submit(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.loop).result(timeout=120)

    async def _setup(self):
        model_dir = build_t5_fixture()
        spec = t5.spec_from_hf_config(
            __import__("json").loads(
                (fixtures.FIXTURE_ROOT / "tiny_t5_served" / "config.json").read_text()))
        params = t5.load_params(Weights(model_dir), spec, jnp.float32)
        tokenizer = ServingTokenizer.load(model_dir)
        self.config = ServingConfig(
            model_name=model_dir, max_sequence_length=64, max_new_tokens=16,
            max_batch_slots=2, prefill_buckets=[16, 32])
        self.config.validate()
        engine = Seq2SeqEngine(spec, params, self.config, eos_token_id=1)
        self.batcher = Batcher(engine, tokenizer, self.config)
        self.batcher.start()
        servicer = GenerationServicer(
            self.config, tokenizer, self.batcher, model_kind="encoder_decoder")
        server = grpc.aio.server()
        server.add_generic_rpc_handlers((make_handler(servicer),))
        self.port = server.add_insecure_port("127.0.0.1:0")
        await server.start()
        self.server = server


@pytest.fixture(scope="module")
def server():
    h = S2SServer()
    h.submit(h._setup())
    return h


@pytest.fixture(scope="module")
def stubs(server):
    channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")

    class Stubs:
        generate = channel.unary_unary(
            "/fmaas.GenerationService/Generate",
            request_serializer=pb.BatchedGenerationRequest.SerializeToString,
            response_deserializer=pb.BatchedGenerationResponse.FromString)
        generate_stream = channel.unary_stream(
            "/fmaas.GenerationService/GenerateStream",
            request_serializer=pb.SingleGenerationRequest.SerializeToString,
            response_deserializer=pb.GenerationResponse.FromString)
        model_info = channel.unary_unary(
            "/fmaas.GenerationService/ModelInfo",
            request_serializer=pb.ModelInfoRequest.SerializeToString,
            response_deserializer=pb.ModelInfoResponse.FromString)

    return Stubs


def params_greedy(n=6):
    return pb.Parameters(method=pb.GREEDY,
                         stopping=pb.StoppingCriteria(max_new_tokens=n))


def test_model_kind(stubs):
    r = stubs.model_info(pb.ModelInfoRequest(model_id="m"))
    assert r.model_kind == pb.ModelInfoResponse.ModelKind.ENCODER_DECODER


def test_greedy_generate(stubs):
    resp = stubs.generate(pb.BatchedGenerationRequest(
        model_id="m", requests=[pb.GenerationRequest(text="hello world test")],
        params=params_greedy()))
    r = resp.responses[0]
    assert r.input_token_count > 0
    assert 1 <= r.generated_token_count <= 6
    assert r.stop_reason in (pb.MAX_TOKENS, pb.EOS_TOKEN)


def test_deterministic_and_stream_parity(stubs):
    req = pb.BatchedGenerationRequest(
        model_id="m", requests=[pb.GenerationRequest(text="the quick brown fox")],
        params=params_greedy())
    a = stubs.generate(req).responses[0]
    b = stubs.generate(req).responses[0]
    assert a.text == b.text
    msgs = list(stubs.generate_stream(pb.SingleGenerationRequest(
        model_id="m", request=pb.GenerationRequest(text="the quick brown fox"),
        params=params_greedy())))
    assert "".join(m.text for m in msgs[1:]) == a.text


def test_concurrent_batching(stubs):
    import concurrent.futures

    texts = ["hello world", "testing one two three"]
    expected = {}
    for t in texts:
        expected[t] = stubs.generate(pb.BatchedGenerationRequest(
            model_id="m", requests=[pb.GenerationRequest(text=t)],
            params=params_greedy())).responses[0].text

    def run(t):
        return t, stubs.generate(pb.BatchedGenerationRequest(
            model_id="m", requests=[pb.GenerationRequest(text=t)],
            params=params_greedy())).responses[0].text

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        for t, text in pool.map(run, texts * 2):
            assert text == expected[t]
