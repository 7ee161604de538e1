"""Prompt (PEFT prefix) cache: loading, validation, LRU, and end-to-end
injection through the engine.

Mirrors the reference's prompt-cache unit tests (reference:
server/tests/test_prompt_cache.py): PEFT vs raw tensor loading, path
traversal rejection, shape/dtype sanitization, LRU eviction.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_generation_inference_tpu.utils.prompt_cache import (
    InvalidPrefix,
    PrefixCache,
    PrefixNotFound,
)

DIM = 64


def write_raw_prefix(root, name, arr):
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    torch.save(torch.tensor(arr), d / "decoder.pt")


def write_peft_prefix(root, name, arr):
    from safetensors.numpy import save_file

    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    save_file({"prompt_embeddings": arr}, d / "adapter_model.safetensors")


@pytest.fixture
def store(tmp_path):
    rng = np.random.default_rng(0)
    write_raw_prefix(tmp_path, "raw1", rng.normal(size=(4, DIM)).astype(np.float32))
    write_peft_prefix(tmp_path, "peft1", rng.normal(size=(6, DIM)).astype(np.float32))
    write_raw_prefix(tmp_path, "bad_dim", rng.normal(size=(4, DIM + 1)).astype(np.float32))
    write_raw_prefix(tmp_path, "too_long", rng.normal(size=(300, DIM)).astype(np.float32))
    return tmp_path


class TestLoading:
    def test_raw_tensor(self, store):
        pc = PrefixCache(store, embed_dim=DIM)
        arr = pc.get("raw1")
        assert arr.shape == (4, DIM)
        assert arr.dtype == np.float32
        assert pc.prefix_length("raw1") == 4

    def test_peft_safetensors(self, store):
        pc = PrefixCache(store, embed_dim=DIM)
        assert pc.get("peft1").shape == (6, DIM)

    def test_missing(self, store):
        pc = PrefixCache(store, embed_dim=DIM)
        with pytest.raises(PrefixNotFound):
            pc.get("nope")

    def test_bad_dim(self, store):
        pc = PrefixCache(store, embed_dim=DIM)
        with pytest.raises(InvalidPrefix):
            pc.get("bad_dim")

    def test_too_long(self, store):
        pc = PrefixCache(store, embed_dim=DIM, max_prefix_length=256)
        with pytest.raises(InvalidPrefix):
            pc.get("too_long")

    @pytest.mark.parametrize("bad_id", ["../evil", "/abs/path", "a/../../b", ""])
    def test_path_traversal_rejected(self, store, bad_id):
        pc = PrefixCache(store, embed_dim=DIM)
        with pytest.raises(InvalidPrefix):
            pc.get(bad_id)


class TestLru:
    def test_eviction_by_size(self, store):
        # each prefix is 4*64*4 = 1KB; cap the cache at ~2 entries
        rng = np.random.default_rng(1)
        for i in range(5):
            write_raw_prefix(store, f"p{i}",
                             rng.normal(size=(4, DIM)).astype(np.float32))
        pc = PrefixCache(store, embed_dim=DIM, max_size_mb=1)
        pc.max_bytes = 2 * 4 * DIM * 4 + 1
        for i in range(5):
            pc.get(f"p{i}")
        assert len(pc) <= 3

    def test_cache_hit_identity(self, store):
        pc = PrefixCache(store, embed_dim=DIM)
        a = pc.get("raw1")
        b = pc.get("raw1")
        assert a is b


class TestEngineInjection:
    def test_prefix_changes_output_and_is_isolated(self, store):
        """A soft prompt must change generation for its request only, and a
        freed slot must not leak the prefix to the next occupant."""
        from tests import fixtures
        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.engine.engine import (
            InferenceEngine, RequestParams)
        from text_generation_inference_tpu.models import families

        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        cfg = ServingConfig(max_sequence_length=64, max_new_tokens=16,
                            max_batch_slots=2, prefill_buckets=[16, 32])
        cfg.validate()
        engine = InferenceEngine(spec, params, cfg, eos_token_id=2)

        pc = PrefixCache(store, embed_dim=DIM)
        prefix = pc.get("raw1")
        prompt = [5, 9, 23, 77]

        def run(prefix_embeds, n=6):
            slot = engine.acquire_slot()
            res = engine.prefill([slot], [prompt], [RequestParams()],
                                 prefix_embeds=[prefix_embeds])
            toks = [int(res.first_token.next_ids[0])]
            for _ in range(n - 1):
                toks.append(int(engine.decode().next_ids[slot]))
            engine.free(slot)
            return toks

        plain = run(None)
        with_prefix = run(prefix)
        assert plain != with_prefix, "soft prompt had no effect"
        plain_again = run(None)
        assert plain_again == plain, "prefix leaked into later request"
        with_prefix_again = run(prefix)
        assert with_prefix_again == with_prefix, "prefixed run not deterministic"


class TestSeq2SeqPrefix:
    def test_encoder_decoder_entry(self, tmp_path):
        rng = np.random.default_rng(3)
        d = tmp_path / "s2s"
        d.mkdir()
        torch.save(torch.tensor(rng.normal(size=(4, DIM)).astype(np.float32)),
                   d / "decoder.pt")
        torch.save(torch.tensor(rng.normal(size=(6, DIM)).astype(np.float32)),
                   d / "encoder.pt")
        pc = PrefixCache(tmp_path, embed_dim=DIM)
        entry = pc.get_entry("s2s")
        assert entry.decoder.shape == (4, DIM)
        assert entry.encoder.shape == (6, DIM)
        assert pc.prefix_length("s2s") == 10

    def test_seq2seq_prefix_changes_output(self, tmp_path):
        """Encoder + decoder soft prompts must alter T5 generation and stay
        isolated between requests."""
        import jax.numpy as jnp
        from tests.test_server_seq2seq import build_t5_fixture
        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.engine.engine import RequestParams
        from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine
        from text_generation_inference_tpu.models import t5
        from text_generation_inference_tpu.utils.prompt_cache import PrefixEntry
        from text_generation_inference_tpu.utils.weights import Weights
        from tests import fixtures as fx

        model_dir = build_t5_fixture()
        import json
        spec = t5.spec_from_hf_config(json.loads(
            (fx.FIXTURE_ROOT / "tiny_t5_served" / "config.json").read_text()))
        params = t5.load_params(Weights(model_dir), spec, jnp.float32)
        cfg = ServingConfig(max_sequence_length=64, max_new_tokens=16,
                            max_batch_slots=2, prefill_buckets=[16, 32])
        cfg.validate()
        engine = Seq2SeqEngine(spec, params, cfg, eos_token_id=1)

        rng = np.random.default_rng(5)
        entry = PrefixEntry(
            decoder=rng.normal(size=(3, spec.d_model)).astype(np.float32),
            encoder=rng.normal(size=(4, spec.d_model)).astype(np.float32))
        prompt = [5, 9, 23, 77]

        def run(pe, n=6):
            slot = engine.acquire_slot()
            res = engine.prefill([slot], [prompt],
                                 [RequestParams(max_new_tokens=n)],
                                 prefix_embeds=[pe])
            toks = [int(res.first_token.next_ids[0])]
            for _ in range(n - 1):
                toks.append(int(engine.decode().next_ids[slot]))
            engine.free(slot)
            return toks

        plain = run(None)
        with_prefix = run(entry)
        assert plain != with_prefix
        assert run(None) == plain
        assert run(entry) == with_prefix
