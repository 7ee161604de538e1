"""Tiny random-weight HF model fixtures (offline, deterministic).

The reference's integration tests use real tiny checkpoints from the hub
(reference: integration_tests/test_server.py:48-64 — gpt2, bloom-560m, ...).
This environment has no network, so we build equivalent tiny models with
random weights via transformers and save them locally; correctness is
checked by comparing our JAX implementations against the HF torch forward
pass on the same weights, which is a stronger check than golden outputs.
"""

import functools
from pathlib import Path

import torch

FIXTURE_ROOT = Path(__file__).parent / "_fixture_models"


def _save(model, name: str) -> str:
    out = FIXTURE_ROOT / name
    if not (out / "config.json").exists():
        out.mkdir(parents=True, exist_ok=True)
        model.save_pretrained(out, safe_serialization=True)
    return str(out)


@functools.lru_cache(maxsize=None)
def tiny_llama() -> str:
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    return _save(LlamaForCausalLM(cfg).eval(), "tiny_llama")


@functools.lru_cache(maxsize=None)
def tiny_gpt2() -> str:
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(1)
    cfg = GPT2Config(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        n_inner=None, activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    return _save(GPT2LMHeadModel(cfg).eval(), "tiny_gpt2")


@functools.lru_cache(maxsize=None)
def tiny_bloom() -> str:
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(2)
    cfg = BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=3, n_head=4,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    return _save(BloomForCausalLM(cfg).eval(), "tiny_bloom")


@functools.lru_cache(maxsize=None)
def tiny_neox() -> str:
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(3)
    cfg = GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=True, attention_dropout=0.0, hidden_dropout=0.0,
    )
    return _save(GPTNeoXForCausalLM(cfg).eval(), "tiny_neox")


@functools.lru_cache(maxsize=None)
def tiny_bigcode() -> str:
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(4)
    cfg = GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        multi_query=True, activation_function="gelu_pytorch_tanh",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    return _save(GPTBigCodeForCausalLM(cfg).eval(), "tiny_bigcode")


@functools.lru_cache(maxsize=None)
def tiny_falcon() -> str:
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(5)
    cfg = FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, alibi=False, bias=False,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    return _save(FalconForCausalLM(cfg).eval(), "tiny_falcon")


@functools.lru_cache(maxsize=None)
def tiny_tokenizer_file() -> str:
    """Train a tiny byte-level BPE tokenizer offline (vocab <= 256 so it can
    drive the tiny fixture models)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    out = FIXTURE_ROOT / "tiny_tokenizer.json"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=240, special_tokens=["<unk>", "<s>", "</s>"])
        corpus = [
            "hello world this is a test of the tokenizer library",
            "the quick brown fox jumps over the lazy dog",
            "testing one two three four five six seven eight nine ten",
            "streaming text generation with stop sequences and tokens",
            "café naïve résumé — unicode text üöä",
        ] * 40
        tok.train_from_iterator(corpus, trainer)
        tok.save(str(out))
    return str(out)


@functools.lru_cache(maxsize=None)
def tokenized_model_dir() -> str:
    """Tiny llama whose vocab exactly matches the fixture tokenizer, with
    tokenizer.json attached — for server-level tests where generated ids must
    all be detokenizable."""
    import shutil

    from tokenizers import Tokenizer
    from transformers import LlamaConfig, LlamaForCausalLM

    tok_file = tiny_tokenizer_file()
    vocab = Tokenizer.from_file(tok_file).get_vocab_size()
    out = FIXTURE_ROOT / "tiny_llama_served"
    if not (out / "config.json").exists():
        torch.manual_seed(10)
        cfg = LlamaConfig(
            vocab_size=vocab, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-6,
            tie_word_embeddings=False, eos_token_id=2, bos_token_id=1,
        )
        _save(LlamaForCausalLM(cfg).eval(), "tiny_llama_served")
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


@functools.lru_cache(maxsize=None)
def tiny_gptj() -> str:
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(6)
    cfg = GPTJConfig(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        rotary_dim=8, activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    return _save(GPTJForCausalLM(cfg).eval(), "tiny_gptj")


@functools.lru_cache(maxsize=None)
def tiny_codegen() -> str:
    from transformers import CodeGenConfig, CodeGenForCausalLM

    torch.manual_seed(7)
    cfg = CodeGenConfig(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        rotary_dim=8, activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    return _save(CodeGenForCausalLM(cfg).eval(), "tiny_codegen")


@functools.lru_cache(maxsize=None)
def tiny_opt() -> str:
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(8)
    cfg = OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=32,  # exercises project_in/out
        activation_function="relu", dropout=0.0, attention_dropout=0.0,
    )
    return _save(OPTForCausalLM(cfg).eval(), "tiny_opt")


@functools.lru_cache(maxsize=None)
def tiny_mpt() -> str:
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(9)
    # 6 heads (non-power-of-two) exercises MPT's ceil+reorder alibi slopes
    cfg = MptConfig(
        vocab_size=256, d_model=96, n_heads=6, n_layers=3, max_seq_len=128,
    )
    cfg.attn_config.attn_pdrop = 0.0
    return _save(MptForCausalLM(cfg).eval(), "tiny_mpt")


@functools.lru_cache(maxsize=None)
def tiny_phi() -> str:
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(10)
    cfg = PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        hidden_act="gelu_new", qk_layernorm=False,
        attention_dropout=0.0, hidden_dropout=0.0, resid_pdrop=0.0,
        embd_pdrop=0.0,
    )
    return _save(PhiForCausalLM(cfg).eval(), "tiny_phi")


@functools.lru_cache(maxsize=None)
def tiny_mistral() -> str:
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(11)
    # sliding_window=8 < test sequence lengths, so the window mask is
    # actually exercised by the HF-parity tests
    cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=8,
        attn_implementation="eager",
    )
    return _save(MistralForCausalLM(cfg).eval(), "tiny_mistral")


@functools.lru_cache(maxsize=None)
def tiny_qwen2() -> str:
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(12)
    cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_sliding_window=False,
        tie_word_embeddings=False,
    )
    return _save(Qwen2ForCausalLM(cfg).eval(), "tiny_qwen2")


@functools.lru_cache(maxsize=None)
def tiny_gemma() -> str:
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(13)
    cfg = GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128,
        hidden_activation="gelu_pytorch_tanh",
    )
    return _save(GemmaForCausalLM(cfg).eval(), "tiny_gemma")


ALL_DECODER_FIXTURES = {
    "llama": tiny_llama,
    "gpt2": tiny_gpt2,
    "bloom": tiny_bloom,
    "gpt_neox": tiny_neox,
    "gpt_bigcode": tiny_bigcode,
    "falcon": tiny_falcon,
    "gptj": tiny_gptj,
    "codegen": tiny_codegen,
    "opt": tiny_opt,
    "mpt": tiny_mpt,
    "phi": tiny_phi,
    "mistral": tiny_mistral,
    "qwen2": tiny_qwen2,
    "gemma": tiny_gemma,
}


# --- real tokenizer-family fixtures (ByteLevel / Metaspace / WordPiece) ---

FAMILY_CORPUS = [
    "hello world this is a test of the tokenizer library",
    "the quick brown fox jumps over the lazy dog",
    "café naïve résumé — unicode text üöä",
    "日本語のテキストです。中文文本。한국어 텍스트",
    "emoji: 👍 👩‍👩‍👧‍👦 🇺🇸 🏳️‍🌈 café́",
    "combining: áêï ñ",
    "streaming text generation with stop sequences and tokens",
] * 30

# Decode targets: streams that stress each family's quirks.
FAMILY_TEXTS = [
    "hello world this is a test",
    "café naïve — üöä résumé",
    "日本語テキスト 한국어 中文",
    "emoji 👍 and flags 🇺🇸🇫🇷 done",
    "family: 👩‍👩‍👧‍👦 plus tone 👍🏽",
    "combining á ê marks",
    "  spaces   and\nnewlines\t tabs ",
]


@functools.lru_cache(maxsize=None)
def bytelevel_tokenizer_file() -> str:
    """GPT-2 family: ByteLevel pre-tokenizer + ByteLevel decoder."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    out = FIXTURE_ROOT / "family_bytelevel.json"
    if not out.exists():
        tok = Tokenizer(models.BPE(unk_token=None))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=512, special_tokens=["<|endoftext|>"],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
        tok.train_from_iterator(FAMILY_CORPUS, trainer)
        tok.save(str(out))
    return str(out)


@functools.lru_cache(maxsize=None)
def metaspace_tokenizer_file() -> str:
    """Llama/T5 family: Metaspace pre-tokenizer + Metaspace decoder over a
    Unigram model (the sentencepiece-compatible path)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    out = FIXTURE_ROOT / "family_metaspace.json"
    if not out.exists():
        tok = Tokenizer(models.Unigram())
        tok.pre_tokenizer = pre_tokenizers.Metaspace()
        tok.decoder = decoders.Metaspace()
        trainer = trainers.UnigramTrainer(
            vocab_size=512, special_tokens=["<unk>", "<s>", "</s>"],
            unk_token="<unk>")
        tok.train_from_iterator(FAMILY_CORPUS, trainer)
        tok.save(str(out))
    return str(out)


@functools.lru_cache(maxsize=None)
def wordpiece_tokenizer_file() -> str:
    """BERT family: WordPiece model + ## continuation decoder."""
    from tokenizers import Tokenizer, decoders, models, normalizers, \
        pre_tokenizers, trainers

    out = FIXTURE_ROOT / "family_wordpiece.json"
    if not out.exists():
        tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
        tok.normalizer = normalizers.NFC()
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.decoder = decoders.WordPiece(prefix="##")
        trainer = trainers.WordPieceTrainer(
            vocab_size=512, special_tokens=["[UNK]", "[CLS]", "[SEP]"])
        tok.train_from_iterator(FAMILY_CORPUS, trainer)
        tok.save(str(out))
    return str(out)




# --- real-family served checkpoints (for the golden-output suite) ---------

def _eos_of(tok_file: str, candidates=("</s>", "<|endoftext|>", "[SEP]")):
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(tok_file)
    for c in candidates:
        tid = tok.token_to_id(c)
        if tid is not None:
            return tid
    return None


@functools.lru_cache(maxsize=None)
def golden_gpt2_dir() -> str:
    """Tiny GPT-2 + REAL ByteLevel BPE tokenizer.json (golden family 1)."""
    import shutil

    from tokenizers import Tokenizer
    from transformers import GPT2Config, GPT2LMHeadModel

    tok_file = bytelevel_tokenizer_file()
    vocab = Tokenizer.from_file(tok_file).get_vocab_size()
    eos = _eos_of(tok_file)
    out = FIXTURE_ROOT / "golden_gpt2"
    if not (out / "config.json").exists():
        torch.manual_seed(21)
        cfg = GPT2Config(
            vocab_size=vocab, n_embd=64, n_layer=2, n_head=4, n_positions=128,
            eos_token_id=eos, bos_token_id=eos)
        _save(GPT2LMHeadModel(cfg).eval(), "golden_gpt2")
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


@functools.lru_cache(maxsize=None)
def golden_llama_dir() -> str:
    """Tiny Llama + REAL Metaspace/Unigram tokenizer.json (golden family 2,
    the sentencepiece-compatible path)."""
    import shutil

    from tokenizers import Tokenizer
    from transformers import LlamaConfig, LlamaForCausalLM

    tok_file = metaspace_tokenizer_file()
    vocab = Tokenizer.from_file(tok_file).get_vocab_size()
    eos = _eos_of(tok_file)
    out = FIXTURE_ROOT / "golden_llama"
    if not (out / "config.json").exists():
        torch.manual_seed(22)
        cfg = LlamaConfig(
            vocab_size=vocab, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-6,
            tie_word_embeddings=False, eos_token_id=eos, bos_token_id=None)
        _save(LlamaForCausalLM(cfg).eval(), "golden_llama")
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


@functools.lru_cache(maxsize=None)
def golden_t5_dir() -> str:
    """Tiny T5 + REAL Metaspace tokenizer.json (golden family 3,
    encoder-decoder)."""
    import shutil

    from tokenizers import Tokenizer
    from transformers import T5Config, T5ForConditionalGeneration

    tok_file = metaspace_tokenizer_file()
    tok = Tokenizer.from_file(tok_file)
    vocab = tok.get_vocab_size()
    eos = _eos_of(tok_file)
    pad = tok.token_to_id("<unk>") or 0
    out = FIXTURE_ROOT / "golden_t5"
    if not (out / "config.json").exists():
        torch.manual_seed(23)
        cfg = T5Config(
            vocab_size=vocab, d_model=64, d_kv=16, d_ff=128, num_layers=2,
            num_decoder_layers=2, num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=32,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            dropout_rate=0.0, decoder_start_token_id=pad,
            eos_token_id=eos, pad_token_id=pad)
        _save(T5ForConditionalGeneration(cfg).eval(), "golden_t5")
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


@functools.lru_cache(maxsize=None)
def tiny_llama_sharded() -> str:
    """tiny_llama split across multiple safetensors files with a
    model.safetensors.index.json — exercises the multi-file index routing
    real checkpoints use (reference loads real sharded repos:
    integration_tests/test_server.py:48-64; a single-file fixture never
    touches utils/weights.py's weight_map path)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    out = FIXTURE_ROOT / "tiny_llama_sharded"
    if not (out / "config.json").exists():
        torch.manual_seed(0)        # identical weights to tiny_llama()
        cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
        )
        model = LlamaForCausalLM(cfg).eval()
        out.mkdir(parents=True, exist_ok=True)
        model.save_pretrained(out, safe_serialization=True,
                              max_shard_size="100KB")
    return str(out)


@functools.lru_cache(maxsize=None)
def tiny_llama_rope_scaled() -> str:
    """Llama with linear rope_scaling + GQA — the real-config features
    (rope_scaling, kv-head ratio) a toy default config never exercises."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(4)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        tie_word_embeddings=False,
    )
    return _save(LlamaForCausalLM(cfg).eval(), "tiny_llama_rope_scaled")


@functools.lru_cache(maxsize=None)
def golden_mt0_dir() -> str:
    """Tiny mt5/mt0-style checkpoint (model_type "mt5": gated-GELU, untied
    lm_head — the reference integration-tests mt0-small, reference:
    integration_tests/test_server.py:48-64) + REAL Metaspace tokenizer.json
    (golden family 4)."""
    import shutil

    from tokenizers import Tokenizer
    from transformers import MT5Config, MT5ForConditionalGeneration

    tok_file = metaspace_tokenizer_file()
    tok = Tokenizer.from_file(tok_file)
    vocab = tok.get_vocab_size()
    eos = _eos_of(tok_file)
    pad = tok.token_to_id("<unk>") or 0
    out = FIXTURE_ROOT / "golden_mt0"
    if not (out / "config.json").exists():
        torch.manual_seed(24)
        cfg = MT5Config(
            vocab_size=vocab, d_model=64, d_kv=16, d_ff=128, num_layers=2,
            num_decoder_layers=2, num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=32,
            tie_word_embeddings=False,
            dropout_rate=0.0, decoder_start_token_id=pad,
            eos_token_id=eos, pad_token_id=pad)
        _save(MT5ForConditionalGeneration(cfg).eval(), "golden_mt0")
        shutil.copy(tok_file, out / "tokenizer.json")
    return str(out)


@functools.lru_cache(maxsize=None)
def medium_llama() -> str:
    """The LARGEST fixture checkpoint (~26M params: hidden 512, 8 layers,
    vocab 4096) — quantization-quality measurements need enough width for
    group-128 INT4 statistics to be meaningful; the tiny fixtures' 64-wide
    linears hold half a quantization group."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(31)
    cfg = LlamaConfig(
        vocab_size=4096, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=1024, rms_norm_eps=1e-6,
        tie_word_embeddings=False, eos_token_id=2, bos_token_id=1)
    return _save(LlamaForCausalLM(cfg).eval(), "medium_llama")
