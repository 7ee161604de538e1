"""T5 encoder-decoder correctness vs HF transformers."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_generation_inference_tpu.models import t5
from text_generation_inference_tpu.utils.weights import Weights
from tests import fixtures

RTOL, ATOL = 3e-4, 3e-4


@pytest.fixture(scope="module")
def setup():
    import functools
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(6)
    cfg = T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=3, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
    )
    model = T5ForConditionalGeneration(cfg).eval()
    model_dir = fixtures._save(model, "tiny_t5")
    spec = t5.spec_from_hf_config(
        __import__("json").loads(
            (fixtures.FIXTURE_ROOT / "tiny_t5" / "config.json").read_text()))
    params = t5.load_params(Weights(model_dir), spec, jnp.float32)
    return model, spec, params


def hf_forward(model, enc_ids, dec_ids):
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(enc_ids.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec_ids.astype(np.int64)))
    return out.logits.float().numpy()


def test_encoder_matches_hf(setup):
    model, spec, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(1, 7)).astype(np.int32)
    padded = np.zeros((1, 12), np.int32)
    padded[:, :7] = ids
    enc = t5.encode(spec, params, jnp.asarray(padded),
                    jnp.asarray([7], jnp.int32))
    with torch.no_grad():
        ref = model.encoder(torch.tensor(ids.astype(np.int64)))[0].numpy()
    np.testing.assert_allclose(np.asarray(enc)[0, :7], ref[0],
                               rtol=RTOL, atol=ATOL)


def test_decoder_prefill_matches_hf(setup):
    model, spec, params = setup
    rng = np.random.default_rng(1)
    enc_ids = rng.integers(0, 256, size=(1, 6)).astype(np.int32)
    dec_ids = np.concatenate(
        [[0], rng.integers(0, 256, size=4)]).astype(np.int32)[None]
    ref = hf_forward(model, enc_ids, dec_ids)

    enc_padded = np.zeros((1, 8), np.int32)
    enc_padded[:, :6] = enc_ids
    enc_states = t5.encode(spec, params, jnp.asarray(enc_padded),
                           jnp.asarray([6], jnp.int32))
    state = t5.T5DecodeState.create(spec, 2, max_dec=16, max_enc=8,
                                    dtype=jnp.float32)
    dec_padded = np.zeros((1, 8), np.int32)
    dec_padded[:, :5] = dec_ids
    logits, state = t5.decoder_prefill(
        spec, params, jnp.asarray(dec_padded), jnp.asarray([5], jnp.int32),
        enc_states, jnp.asarray([6], jnp.int32), jnp.asarray([0], jnp.int32),
        state)
    np.testing.assert_allclose(np.asarray(logits)[0, :5], ref[0],
                               rtol=RTOL, atol=ATOL)


def test_incremental_decode_matches_hf(setup):
    model, spec, params = setup
    rng = np.random.default_rng(2)
    enc_ids = rng.integers(0, 256, size=(1, 5)).astype(np.int32)
    dec_full = np.concatenate(
        [[0], rng.integers(0, 256, size=6)]).astype(np.int32)[None]
    ref = hf_forward(model, enc_ids, dec_full)

    num_slots, slot = 3, 1
    enc_padded = np.zeros((1, 8), np.int32)
    enc_padded[:, :5] = enc_ids
    # state covers every slot; encoder states padded into the slot row
    state = t5.T5DecodeState.create(spec, num_slots, max_dec=16, max_enc=8,
                                    dtype=jnp.float32)
    enc_states = t5.encode(spec, params, jnp.asarray(enc_padded),
                           jnp.asarray([5], jnp.int32))
    dec_start = np.zeros((1, 4), np.int32)
    dec_start[0, 0] = 0
    logits, state = t5.decoder_prefill(
        spec, params, jnp.asarray(dec_start), jnp.asarray([1], jnp.int32),
        enc_states, jnp.asarray([5], jnp.int32),
        jnp.asarray([slot], jnp.int32), state)
    np.testing.assert_allclose(np.asarray(logits)[0, 0], ref[0, 0],
                               rtol=RTOL, atol=ATOL)

    for pos in range(1, 7):
        ids = np.zeros((num_slots,), np.int32)
        ids[slot] = dec_full[0, pos]
        positions = np.zeros((num_slots,), np.int32)
        positions[slot] = pos
        logits, state = t5.decoder_step(
            spec, params, jnp.asarray(ids), jnp.asarray(positions), state)
        np.testing.assert_allclose(
            np.asarray(logits)[slot], ref[0, pos], rtol=RTOL, atol=ATOL,
            err_msg=f"t5 decode mismatch at position {pos}")


def test_chunked_decode_matches_unchunked(setup):
    """Seq2SeqEngine decode_chunk > 1 must produce identical streams
    (counterpart of the slot engine's chunk-parity test)."""
    from text_generation_inference_tpu.config import ServingConfig
    from text_generation_inference_tpu.engine.engine import RequestParams
    from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine

    _, spec, params = setup

    def build(chunk):
        cfg = ServingConfig(
            max_sequence_length=32, max_new_tokens=16, max_batch_slots=2,
            prefill_buckets=[8, 16], decode_chunk=chunk)
        cfg.validate()
        return Seq2SeqEngine(spec, params, cfg, eos_token_id=-1)

    prompt = [3, 7, 11, 2]

    def run(engine, n_chunks):
        slot = engine.acquire_slot()
        res = engine.prefill([slot], [prompt], [RequestParams()])
        toks = [int(res.first_token.next_ids[0])]
        for _ in range(n_chunks):
            for step in engine.decode_steps():
                toks.append(int(step.next_ids[slot]))
        return toks

    plain = run(build(1), 8)
    chunked = run(build(4), 2)
    assert plain == chunked


def test_seq2seq_warmup_resets_state(setup):
    from text_generation_inference_tpu.config import ServingConfig
    from text_generation_inference_tpu.engine.engine import RequestParams
    from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine

    _, spec, params = setup
    cfg = ServingConfig(
        max_sequence_length=32, max_new_tokens=16, max_batch_slots=2,
        prefill_buckets=[8, 16], decode_chunk=2)
    cfg.validate()
    engine = Seq2SeqEngine(spec, params, cfg, eos_token_id=-1)
    engine.warmup()
    assert len(engine.free_slots) == engine.num_slots
    # behavior after warmup identical to a fresh engine
    fresh = Seq2SeqEngine(spec, params, cfg, eos_token_id=-1)
    for eng in (engine, fresh):
        slot = eng.acquire_slot()
        res = eng.prefill([slot], [[3, 7, 11]], [RequestParams()])
        eng._last = [int(res.first_token.next_ids[0])]
        for step in eng.decode_steps():
            eng._last.append(int(step.next_ids[slot]))
    assert engine._last == fresh._last


def test_no_details_decode_matches_and_skips_details(setup):
    """want_details=False must emit the identical token stream through a
    separate decode program that skips logprob/top-k/rank work (round-2
    review: seq2seq always computed details; the slot engine's no-details
    program was built to avoid exactly that)."""
    from text_generation_inference_tpu.config import ServingConfig
    from text_generation_inference_tpu.engine.engine import RequestParams
    from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine

    _, spec, params = setup

    def build(chunk=2):
        cfg = ServingConfig(
            max_sequence_length=32, max_new_tokens=16, max_batch_slots=2,
            prefill_buckets=[8, 16], decode_chunk=chunk)
        cfg.validate()
        return Seq2SeqEngine(spec, params, cfg, eos_token_id=-1)

    prompt = [3, 7, 11, 2]

    def run(engine, want_details):
        slot = engine.acquire_slot()
        res = engine.prefill([slot], [prompt], [RequestParams()])
        toks = [int(res.first_token.next_ids[0])]
        steps_all = []
        for _ in range(3):
            steps = engine.decode_steps(want_details=want_details)
            steps_all.extend(steps)
            toks.extend(int(s.next_ids[slot]) for s in steps)
        return toks, steps_all

    with_details, steps_d = run(build(), True)
    without, steps_n = run(build(), False)
    assert with_details == without
    # two distinct compiled programs exist
    eng = build()
    eng.decode_steps(want_details=False)
    eng.decode_steps(want_details=True)
    assert {k[0] for k in eng._decode_fns} == {False, True}
    # the details-bearing run carries real ranks; the no-details run's
    # rank channel is inert (zeros)
    import numpy as np
    assert any(int(s.rank[0]) > 0 for s in steps_d)
    assert all(int(s.rank[0]) == 0 for s in steps_n)


def test_ctx_bucketed_ring_decode_matches_full(setup):
    """Decoder-context buckets (self-KV read sliced per chunk) must be
    invisible in the token stream, including across a bucket crossing
    (seq2seq counterpart of the slot engine's cache_rows parity test)."""
    from text_generation_inference_tpu.config import ServingConfig
    from text_generation_inference_tpu.engine.engine import RequestParams
    from text_generation_inference_tpu.engine.seq2seq import Seq2SeqEngine

    _, spec, params = setup

    def build(buckets):
        cfg = ServingConfig(
            max_sequence_length=32, max_new_tokens=24, max_batch_slots=2,
            prefill_buckets=[8, 16], decode_chunk=4,
            decode_write_mode="ring", decode_ctx_buckets=buckets)
        cfg.validate()
        return Seq2SeqEngine(spec, params, cfg, eos_token_id=-1)

    prompt = [3, 7, 11, 2]

    def run(engine):
        slot = engine.acquire_slot()
        res = engine.prefill([slot], [prompt], [RequestParams()])
        toks = [int(res.first_token.next_ids[0])]
        rows_used = []
        for _ in range(5):                      # 20 tokens: crosses 8 -> 16
            rows_used.append(engine._pick_cache_rows())
            for step in engine.decode_steps():
                toks.append(int(step.next_ids[slot]))
        return toks, rows_used

    full, rows_full = run(build(None))
    bucketed, rows_b = run(build([8, 16]))
    assert full == bucketed
    assert rows_full == [25] * 5               # max_dec, no buckets
    assert 8 in rows_b and 16 in rows_b        # actually crossed a bucket
