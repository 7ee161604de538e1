"""Incremental detokenizer: streaming == non-streaming parity + stop sequences."""

import numpy as np
import pytest

from text_generation_inference_tpu.utils.detokenizer import (
    IncrementalDecoder,
    StopSequenceState,
)
from text_generation_inference_tpu.utils.tokenization import ServingTokenizer
from tests import fixtures


@pytest.fixture(scope="module")
def tok():
    from tokenizers import Tokenizer

    return ServingTokenizer(
        Tokenizer.from_file(fixtures.tiny_tokenizer_file()), eos_token_id=2)


TEXTS = [
    "hello world this is a test",
    "the quick brown fox jumps over the lazy dog",
    "café naïve résumé — unicode text üöä",
    "one token",
    "  leading and trailing spaces  ",
    "streaming text generation with stop sequences",
]


class TestIncrementalParity:
    @pytest.mark.parametrize("text", TEXTS)
    def test_stream_concat_equals_full_decode(self, tok, text):
        ids = tok.encode(text)
        dec = IncrementalDecoder(tok)
        parts = [dec.push(i) for i in ids]
        parts.append(dec.flush())
        assert "".join(parts) == tok.decode(ids)

    def test_random_id_sequences(self, tok):
        rng = np.random.default_rng(3)
        for _ in range(20):
            ids = rng.integers(3, tok.vocab_size, size=rng.integers(1, 40)).tolist()
            dec = IncrementalDecoder(tok)
            parts = [dec.push(i) for i in ids]
            parts.append(dec.flush())
            assert "".join(parts) == tok.decode(ids)

    def test_multibyte_utf8_held_until_complete(self, tok):
        # byte-level BPE may split a multibyte char across tokens; no
        # replacement char may ever be emitted mid-stream
        ids = tok.encode("café — üöä naïve")
        dec = IncrementalDecoder(tok)
        out = ""
        for i in ids:
            delta = dec.push(i)
            assert "�" not in delta
            out += delta
        out += dec.flush()
        assert out == tok.decode(ids)


class TestStopSequences:
    def test_simple_match(self):
        st = StopSequenceState(["STOP"], include_stop_sequence=True)
        assert st.feed("hello ") is None
        m = st.feed("STOP now")
        assert m == ("STOP", 10)
        assert st.final_text(m) == "hello STOP"

    def test_exclude_stop_sequence(self):
        st = StopSequenceState(["STOP"], include_stop_sequence=False)
        m = st.feed("hello STOP now")
        assert st.final_text(m) == "hello "

    def test_match_spanning_deltas(self):
        st = StopSequenceState(["abc"], include_stop_sequence=True)
        assert st.feed("xxa") is None
        assert st.feed("b") is None
        m = st.feed("cyy")
        assert m is not None
        assert st.final_text(m) == "xxabc"

    def test_earliest_match_wins(self):
        st = StopSequenceState(["later", "xy"], include_stop_sequence=True)
        m = st.feed("abxycdlater")
        assert m[0] == "xy"

    def test_held_back_len(self):
        st = StopSequenceState(["abcd"], include_stop_sequence=False)
        st.feed("hello ab")
        assert st.held_back_len() == 2
        st.feed("zz")
        assert st.held_back_len() == 0

    def test_no_stop_sequences(self):
        st = StopSequenceState([], include_stop_sequence=True)
        assert st.feed("anything") is None
        assert st.held_back_len() == 0
        assert st.final_text(None) == "anything"
