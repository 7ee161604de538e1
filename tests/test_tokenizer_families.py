"""Detokenizer fidelity across real tokenizer families.

The reference ships five decoder-family-specific incremental decoders
(reference: router/src/decoder.rs:12-158 — ByteLevel, Metaspace first-diff,
WordPiece first-diff, BPE last-diff, CTC dedup). Our single sliding-window
algorithm must reproduce exact streaming==non-streaming parity on each
family's real tokenizer.json, including multi-byte UTF-8, combining
characters, emoji ZWJ sequences, and Hangul — plus byte-exact stop-sequence
matching (batcher.rs:792-807) and grapheme-safe streaming emission
(decoder.rs:487-493).

Fixture tokenizers here are *trained offline* with the real `tokenizers`
library using each family's actual model/pre_tokenizer/decoder classes —
the same code paths a downloaded tokenizer.json exercises.
"""

import functools
import json

import numpy as np
import pytest

from text_generation_inference_tpu.utils import graphemes
from text_generation_inference_tpu.utils.detokenizer import (
    IncrementalDecoder,
    StopSequenceState,
)
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer
from tests.fixtures import (FAMILY_TEXTS as TEXTS,
                            FIXTURE_ROOT, bytelevel_tokenizer_file,
                            metaspace_tokenizer_file,
                            wordpiece_tokenizer_file)

FAMILIES = {
    "bytelevel": bytelevel_tokenizer_file,
    "metaspace": metaspace_tokenizer_file,
    "wordpiece": wordpiece_tokenizer_file,
}


@pytest.fixture(scope="module", params=sorted(FAMILIES))
def family_tok(request):
    from tokenizers import Tokenizer

    f = FAMILIES[request.param]()
    return ServingTokenizer(Tokenizer.from_file(f), eos_token_id=None)


class TestFamilyParity:
    @pytest.mark.parametrize("text", TEXTS)
    def test_stream_concat_equals_full_decode(self, family_tok, text):
        ids = family_tok.encode(text)
        dec = IncrementalDecoder(family_tok)
        parts = [dec.push(i) for i in ids]
        parts.append(dec.flush())
        assert "".join(parts) == family_tok.decode(ids)

    def test_random_id_sequences(self, family_tok):
        # arbitrary id soup — the decoder must stay exact even on ids no
        # encoder would emit adjacently (sampling can produce anything)
        rng = np.random.default_rng(7)
        vocab = family_tok.vocab_size
        for _ in range(25):
            ids = rng.integers(0, vocab, size=rng.integers(1, 60)).tolist()
            dec = IncrementalDecoder(family_tok)
            parts = [dec.push(i) for i in ids]
            parts.append(dec.flush())
            assert "".join(parts) == family_tok.decode(ids)

    def test_no_replacement_char_mid_stream(self, family_tok):
        for text in TEXTS:
            ids = family_tok.encode(text)
            dec = IncrementalDecoder(family_tok)
            for i in ids:
                assert "�" not in dec.push(i)


class TestByteExactStops:
    """Stop-sequence offsets are UTF-8 byte offsets (batcher.rs:792-807)."""

    def test_multibyte_stop_sequence(self):
        st = StopSequenceState(["。"], include_stop_sequence=False)
        m = st.feed("日本語です。続き")
        assert m is not None
        assert st.final_text(m) == "日本語です"

    def test_stop_split_across_codepoint_bytes(self):
        # the matcher must find a stop even when deltas split the stream at
        # arbitrary (token) boundaries around multibyte chars
        st = StopSequenceState(["—end"], include_stop_sequence=True)
        assert st.feed("text ") is None
        assert st.feed("—") is None
        m = st.feed("end tail")
        assert m is not None
        assert st.final_text(m) == "text —end"

    def test_held_back_is_bytes(self):
        st = StopSequenceState(["——STOP"], include_stop_sequence=False)
        st.feed("abc——")   # two em-dashes = 6 bytes of a potential match
        assert st.held_back_len() == 6

    def test_visible_text_never_splits_codepoint(self):
        # hold-back can land mid-codepoint; visible_text must not emit a
        # partial UTF-8 sequence
        st = StopSequenceState(["\x9csuffix"], include_stop_sequence=False)
        # "—" is e2 80 94; a stop starting with byte 0x9c can't exist in real
        # use but held-back byte counts CAN cut into a trailing multibyte
        # char; simulate via a stop whose prefix overlaps the tail bytes.
        st2 = StopSequenceState(["—X"], include_stop_sequence=False)
        st2.feed("abc—")
        vis = st2.visible_text(None, final=False)
        assert "�" not in vis
        # 3 bytes held for the stop prefix "—", then the final grapheme
        # ("c") is also held since a later token could extend it
        assert vis == "ab"

    def test_native_python_parity_multibyte(self):
        from text_generation_inference_tpu.utils import native_tokenproc as nt

        if not nt.available():
            pytest.skip("libtokenproc.so not built")
        cases = [
            (["。"], "日本語です。続き"),
            (["stop"], "abc stop def"),
            (["👍"], "emoji 👍 tail"),
            (["—end"], "a—e—end"),
        ]
        for seqs, text in cases:
            for include in (False, True):
                py = StopSequenceState(seqs, include)
                na = nt.NativeStopState(seqs, include)
                mp = mn = None
                for ch in text:   # worst case: one char per delta
                    if mp is None:
                        mp = py.feed(ch)
                    if mn is None:
                        mn = na.feed(ch)
                assert mp == mn
                assert py.final_text(mp) == na.final_text(mn)
                assert py.held_back_len() == na.held_back_len()


class TestGraphemeSafety:
    def test_combining_mark_held(self):
        assert graphemes.safe_emit_len("café") == 3   # hold "e◌́"
        assert graphemes.safe_emit_len("áb") == 2      # "a◌́" complete

    def test_zwj_family_held_as_one(self):
        fam = "👩‍👩‍👧‍👦"
        assert graphemes.safe_emit_len("hi " + fam) == 3
        # a trailing ZWJ keeps the whole cluster open
        assert graphemes.safe_emit_len("hi " + fam + "‍") == 3

    def test_regional_indicator_pairs(self):
        us = "\U0001f1fa\U0001f1f8"
        fr = "\U0001f1eb\U0001f1f7"
        # last flag (pair) is held; the first is complete
        assert graphemes.safe_emit_len(us + fr) == 2

    def test_skin_tone_modifier(self):
        assert graphemes.safe_emit_len("x👍\U0001f3fd") == 1

    def test_hangul_jamo(self):
        # L+V+T jamo compose into one cluster
        s = "ab각"
        assert graphemes.safe_emit_len(s) == 2

    def test_crlf(self):
        assert graphemes.safe_emit_len("a\r\n") == 1
        assert graphemes.safe_emit_len("a\r\nb") == 3

    def test_streaming_never_emits_partial_cluster(self):
        st = StopSequenceState([], include_stop_sequence=False)
        fam = "👩‍👩‍👧‍👦"
        text = f"start {fam} mid é end"
        emitted = []
        prev = ""
        for ch in text:
            st.feed(ch)
            vis = st.visible_text(None, final=False)
            # monotone growth, and never a bare ZWJ / dangling mark at the end
            assert vis.startswith(prev)
            assert not vis.endswith("‍")
            assert len(vis) == graphemes.safe_emit_len(vis + "x") or \
                graphemes.last_cluster_start(vis + "́") <= len(vis)
            prev = vis
        final = st.visible_text(None, final=True)
        assert final == text

    def test_family_stream_grapheme_safe(self):
        """End-to-end: ByteLevel tokenizer splitting an emoji across tokens
        must not surface a partial cluster through visible_text."""
        from tokenizers import Tokenizer

        tok = ServingTokenizer(
            Tokenizer.from_file(bytelevel_tokenizer_file()), eos_token_id=None)
        text = "ok 👩‍👩‍👧‍👦 done"
        ids = tok.encode(text)
        dec = IncrementalDecoder(tok)
        st = StopSequenceState([], include_stop_sequence=False)
        prev = ""
        for i in ids:
            st.feed(dec.push(i))
            vis = st.visible_text(None, final=False)
            assert vis.startswith(prev)
            assert "�" not in vis
            assert not vis.endswith("‍")
            prev = vis
        st.feed(dec.flush())
        assert st.visible_text(None, final=True) == tok.decode(ids)


class TestCTCDedup:
    """CTC-family streaming (reference: router/src/decoder.rs:339-372
    IncrementalDeDupDecoder): consecutive duplicate ids collapse, the pad
    (blank) token is removed, the word delimiter maps to a space — and the
    stream must equal the tokenizer's own one-shot CTC decode."""

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _ctc_tokenizer_file() -> str:
        from tokenizers import Tokenizer, decoders, models

        vocab = {"<pad>": 0, "|": 1}
        for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz'"):
            vocab[ch] = i + 2
        tok = Tokenizer(models.WordLevel(vocab, unk_token="<pad>"))
        tok.decoder = decoders.CTC(pad_token="<pad>",
                                   word_delimiter_token="|", cleanup=True)
        path = str(FIXTURE_ROOT / "tokenizer_ctc.json")
        FIXTURE_ROOT.mkdir(parents=True, exist_ok=True)
        tok.save(path)
        return path

    def _load(self):
        import pathlib
        import shutil
        import tempfile

        d = pathlib.Path(tempfile.mkdtemp())
        shutil.copy(self._ctc_tokenizer_file(), d / "tokenizer.json")
        return ServingTokenizer.load(str(d))

    def test_decoder_type_detected_and_routed(self):
        from text_generation_inference_tpu.utils.detokenizer import (
            CTCIncrementalDecoder, make_incremental_decoder)

        tok = self._load()
        assert tok.decoder_type == "CTC"
        assert isinstance(make_incremental_decoder(tok),
                          CTCIncrementalDecoder)

    def test_stream_equals_full_ctc_decode(self):
        from text_generation_inference_tpu.utils.detokenizer import (
            make_incremental_decoder)

        tok = self._load()
        # raw CTC emission for "hi cat": duplicates + blanks interleaved
        def ids_of(s):
            return [tok.encode(c)[0] if c != " " else 1 for c in s]

        raw = []
        for tid in ids_of("hi|cat"):
            raw.extend([tid, tid, 0])     # dup each emission, then blank
        dec = make_incremental_decoder(tok)
        parts = [dec.push(i) for i in raw]
        parts.append(dec.flush())
        assert "".join(parts) == tok.decode(raw)
        assert "".join(parts) == "hi cat"

    def test_duplicate_across_window_sizes(self):
        """Long runs of duplicates (the window-boundary case that breaks
        the sliding-window algorithm) still emit each symbol once."""
        from text_generation_inference_tpu.utils.detokenizer import (
            make_incremental_decoder)

        tok = self._load()
        a = tok.encode("a")[0]
        b = tok.encode("b")[0]
        raw = [a] * 40 + [0] + [a] * 3 + [b] * 25
        dec = make_incremental_decoder(tok)
        out = "".join([dec.push(i) for i in raw] + [dec.flush()])
        assert out == tok.decode(raw) == "aab"
