"""Golden-output suite over real-tokenizer-family checkpoints.

Port of the reference's per-model golden case flow (reference:
integration_tests/test_server.py:261-299 run_test_cases_async +
test_cases_gpt2.yaml, approx.py nested approx matcher): YAML cases in
tests/golden/ hold fmaas JSON requests + expected responses generated from
HF torch on the same checkpoints (scripts/gen_goldens.py) — an independent
oracle, so a weight-mapping transpose, tokenizer regression, or stopping
semantics drift fails here even if every other test passes.

Each case runs three ways: unary, streaming (concat of deltas must equal
the unary text), and the whole file concurrently (results must match the
sequential ones).
"""

import asyncio
import concurrent.futures
import threading
from pathlib import Path

import grpc
import pytest
import yaml
from google.protobuf import json_format

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.pb import generation_pb2 as pb
from text_generation_inference_tpu.scheduler.batcher import Batcher
from text_generation_inference_tpu.server.grpc_server import (
    GenerationServicer,
    make_handler,
)
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer
from tests import fixtures

GOLDEN_DIR = Path(__file__).parent / "golden"

FAMILIES = {
    "gpt2": fixtures.golden_gpt2_dir,
    "llama": fixtures.golden_llama_dir,
    "t5": fixtures.golden_t5_dir,
    # mt5/mt0-style (gated-GELU, untied head) — the reference
    # integration-tests mt0-small (integration_tests/test_cases_mt0small.yaml)
    "mt0": fixtures.golden_mt0_dir,
}


def _load_cases(family: str) -> list:
    """Oracle expectations, regenerated in-environment and cached.

    The committed tests/golden/*.yaml are snapshots from one environment;
    the fixture checkpoints are seeded torch random inits whose exact
    weights drift across torch/tokenizers releases, which flips greedy
    ties. The authoritative expectation is therefore the HF-torch oracle
    run HERE, over the SAME fixture files the engine loads — cached under
    a fingerprint of (fixture checkpoint bytes, generator source) so the
    multi-second torch loop runs once per environment."""
    import hashlib

    model_dir = Path(FAMILIES[family]())
    gen_src = (Path(__file__).parents[1] / "scripts" / "gen_goldens.py")
    h = hashlib.sha256(gen_src.read_bytes())
    for f in sorted(model_dir.iterdir()):
        h.update(f.name.encode())
        h.update(f.read_bytes())
    cache = fixtures.FIXTURE_ROOT / \
        f"golden_cases_{family}.{h.hexdigest()[:12]}.yaml"
    if cache.exists():
        return yaml.safe_load(cache.read_text())
    import importlib.util

    spec = importlib.util.spec_from_file_location("gen_goldens", gen_src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cases = mod.gen_family(family)
    cache.write_text(yaml.safe_dump(cases, allow_unicode=True,
                                    sort_keys=False))
    return cases


# --- nested approx matcher (reference: approx.py:11-17) --------------------

def assert_approx(expected, actual, path="", rel=5e-3, absol=5e-3):
    """Every key/element in `expected` must match `actual`; floats with
    tolerance. Extra keys in actual are allowed (proto3 emits fields the
    oracle doesn't model, e.g. token text)."""
    if isinstance(expected, dict):
        assert isinstance(actual, dict), f"{path}: {actual!r} not a dict"
        for k, v in expected.items():
            assert k in actual, f"{path}.{k}: missing (actual={actual!r})"
            assert_approx(v, actual[k], f"{path}.{k}", rel, absol)
    elif isinstance(expected, list):
        assert isinstance(actual, list) and len(actual) == len(expected), \
            f"{path}: length {len(actual)} != {len(expected)}"
        for i, (e, a) in enumerate(zip(expected, actual)):
            assert_approx(e, a, f"{path}[{i}]", rel, absol)
    elif isinstance(expected, float):
        assert actual == pytest.approx(expected, rel=rel, abs=absol), \
            f"{path}: {actual} != approx({expected})"
    else:
        assert expected == actual, f"{path}: {actual!r} != {expected!r}"


class GoldenServer:
    def __init__(self, family):
        self.family = family
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        self.submit(self._setup())

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_forever()

    def submit(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.loop).result(
            timeout=300)

    async def _setup(self):
        model_dir = FAMILIES[self.family]()
        tokenizer = ServingTokenizer.load(model_dir)
        self.config = ServingConfig(
            model_name=model_dir, max_sequence_length=64, max_new_tokens=32,
            max_batch_size=8, max_batch_slots=4, prefill_buckets=[16, 32],
            max_waiting_tokens=4, default_max_new_tokens=20,
        )
        self.config.validate()
        if self.family in ("t5", "mt0"):
            import json

            from text_generation_inference_tpu.engine.seq2seq import (
                Seq2SeqEngine)
            from text_generation_inference_tpu.models import t5
            from text_generation_inference_tpu.utils.weights import Weights

            spec = t5.spec_from_hf_config(json.loads(
                (Path(model_dir) / "config.json").read_text()))
            params = t5.load_params(Weights(model_dir), spec, jnp.float32)
            engine = Seq2SeqEngine(spec, params, self.config,
                                   eos_token_id=tokenizer.eos_token_id)
            kind = "encoder_decoder"
        else:
            from text_generation_inference_tpu.engine.engine import (
                InferenceEngine)
            from text_generation_inference_tpu.models import families

            spec, params = families.load_model(model_dir, dtype=jnp.float32)
            engine = InferenceEngine(
                spec, params, self.config,
                eos_token_id=tokenizer.eos_token_id)
            kind = "decoder"
        self.batcher = Batcher(engine, tokenizer, self.config)
        self.batcher.start()
        servicer = GenerationServicer(self.config, tokenizer, self.batcher,
                                      model_kind=kind)
        server = grpc.aio.server()
        server.add_generic_rpc_handlers((make_handler(servicer),))
        self.port = server.add_insecure_port("127.0.0.1:0")
        await server.start()
        self.server = server


_servers = {}


@pytest.fixture(params=sorted(FAMILIES))
def golden(request):
    fam = request.param
    if fam not in _servers:
        _servers[fam] = GoldenServer(fam)
    h = _servers[fam]
    cases = _load_cases(fam)
    channel = grpc.insecure_channel(f"127.0.0.1:{h.port}")
    generate = channel.unary_unary(
        "/fmaas.GenerationService/Generate",
        request_serializer=pb.BatchedGenerationRequest.SerializeToString,
        response_deserializer=pb.BatchedGenerationResponse.FromString)
    stream = channel.unary_stream(
        "/fmaas.GenerationService/GenerateStream",
        request_serializer=pb.SingleGenerationRequest.SerializeToString,
        response_deserializer=pb.GenerationResponse.FromString)
    return fam, cases, generate, stream


def _req(case):
    return json_format.ParseDict(case["request"],
                                 pb.BatchedGenerationRequest())


def _resp_dict(resp):
    return json_format.MessageToDict(resp)


class TestGolden:
    def test_unary_cases(self, golden):
        fam, cases, generate, _ = golden
        for case in cases:
            resp = generate(_req(case))
            assert_approx(case["response"], _resp_dict(resp),
                          path=f"{fam}:{case['name']}")

    def test_streaming_parity(self, golden):
        """Per case, per request: streamed text concat == unary text and
        final stop reason / counts match (reference runs every golden case
        through both APIs)."""
        fam, cases, generate, stream = golden
        for case in cases:
            breq = _req(case)
            for i, r in enumerate(breq.requests):
                sreq = pb.SingleGenerationRequest(
                    model_id=breq.model_id, params=breq.params, request=r)
                msgs = list(stream(sreq))
                text = "".join(m.text for m in msgs[1:])   # [0] = input msg
                expected = case["response"]["responses"][i]
                assert text == expected.get("text", ""), \
                    f"{fam}:{case['name']}[{i}] stream text mismatch"
                last = msgs[-1]
                assert pb.StopReason.Name(last.stop_reason) == \
                    expected["stopReason"]
                assert last.generated_token_count == \
                    expected["generatedTokenCount"]

    def test_concurrent_matches_sequential(self, golden):
        fam, cases, generate, _ = golden
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            futures = [(case, ex.submit(generate, _req(case)))
                       for case in cases for _ in range(2)]
            for case, fut in futures:
                assert_approx(case["response"], _resp_dict(fut.result()),
                              path=f"{fam}:{case['name']}:concurrent")
