"""Incremental detokenization with streaming == non-streaming parity.

The reference implements five decoder-family-specific incremental decoders in
Rust (reference: router/src/decoder.rs:12-158: ByteLevel, Metaspace/WordPiece
first-diff, BPE last-diff, CTC dedup, plus a Llama "Sequence" workaround) to
turn per-step token ids into exact text deltas. This implementation gets the
same guarantees with a single algorithm: a sliding window of recent ids is
re-decoded each step and the previously-emitted prefix is subtracted, so any
tokenizer's context-dependent continuation rules are applied by the tokenizer
itself. Incomplete UTF-8 output (the replacement character at the window
end) is deferred until complete, mirroring decoder.rs:469-495.

Invariant (tested): the concatenation of emitted deltas equals the one-shot
`decode()` of the full id sequence — the reference's "parity of streaming and
non-streaming output" README guarantee.
"""

from __future__ import annotations

from typing import Optional

REPLACEMENT_CHAR = "�"


class IncrementalDecoder:
    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self._tok = tokenizer
        self._skip_special = skip_special_tokens
        self.ids: list[int] = []
        self._prefix_offset = 0   # window start (id index)
        self._read_offset = 0     # ids already represented in emitted text

    def _decode(self, ids: list[int]) -> str:
        if not ids:
            return ""
        return self._tok.decode(ids, skip_special_tokens=self._skip_special)

    def push(self, token_id: int) -> str:
        """Add one generated id; return the newly-complete text (maybe '')."""
        self.ids.append(token_id)
        prefix_text = self._decode(self.ids[self._prefix_offset:self._read_offset])
        new_text = self._decode(self.ids[self._prefix_offset:])
        if len(new_text) > len(prefix_text) and not new_text.endswith(REPLACEMENT_CHAR):
            delta = new_text[len(prefix_text):]
            self._prefix_offset = self._read_offset
            self._read_offset = len(self.ids)
            return delta
        # tokens that complete no new text yet (e.g. partial UTF-8) are held
        return ""

    def flush(self) -> str:
        """Emit whatever is still buffered (call at end of generation)."""
        prefix_text = self._decode(self.ids[self._prefix_offset:self._read_offset])
        new_text = self._decode(self.ids[self._prefix_offset:])
        delta = new_text[len(prefix_text):] if len(new_text) > len(prefix_text) else ""
        self._read_offset = len(self.ids)
        self._prefix_offset = max(self._read_offset - 8, 0)
        return delta


class StopSequenceState:
    """Byte-window stop-sequence matching over the accumulated output text.

    Mirrors the router's per-token stop-sequence evaluation
    (reference: router/src/batcher.rs:757-807): after each text delta, check
    whether any stop sequence now occurs; report the sequence and the
    position so the caller can trim the output (include_stop_sequence flag,
    reference: decoder.rs hold_back_bytes buffering).
    """

    def __init__(self, stop_sequences: list[str], include_stop_sequence: bool):
        self.stop_sequences = stop_sequences
        self.include = include_stop_sequence
        self.text = ""
        self._max_len = max((len(s) for s in stop_sequences), default=0)

    def feed(self, delta: str) -> Optional[tuple[str, int]]:
        """Append delta; if a stop sequence completed inside the new text,
        return (sequence, end_index_in_full_text)."""
        if not self.stop_sequences:
            self.text += delta
            return None
        start_scan = max(len(self.text) - self._max_len + 1, 0)
        self.text += delta
        window = self.text[start_scan:]
        best: Optional[tuple[str, int]] = None
        for seq in self.stop_sequences:
            idx = window.find(seq)
            if idx != -1:
                end = start_scan + idx + len(seq)
                if best is None or end < best[1]:
                    best = (seq, end)
        return best

    def final_text(self, matched: Optional[tuple[str, int]]) -> str:
        """Full output text, trimmed per the include_stop_sequence setting."""
        if matched is None:
            return self.text
        seq, end = matched
        return self.text[:end] if self.include else self.text[: end - len(seq)]

    def held_back_len(self) -> int:
        """How many trailing chars must be withheld from streaming because
        they could still become part of a stop sequence (reference:
        decoder.rs hold_back_bytes)."""
        if not self.stop_sequences:
            return 0
        held = 0
        for seq in self.stop_sequences:
            for k in range(min(len(seq) - 1, len(self.text)), 0, -1):
                if self.text.endswith(seq[:k]):
                    held = max(held, k)
                    break
        return held

    def visible_text(self, matched, final: bool) -> str:
        """Prefix of the output safe to show: everything on final, text
        minus the stop-seq hold-back while streaming."""
        if final:
            return self.final_text(matched)
        held = self.held_back_len()
        return self.text[: len(self.text) - held] if held else self.text
