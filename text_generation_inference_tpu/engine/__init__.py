"""Slot-based static-shape TPU inference engine.

The reference mutates batch tensor shapes every step (prune / concatenate /
add-on batches, reference: server/.../models/causal_lm.py:218-545). Under XLA
that would recompile constantly, so this engine replaces the whole batch state
machine with a fixed-width *slot* model:

  * decode runs one compiled step over `max_batch_slots` slots every
    iteration, with inactive slots masked out;
  * prefill is compiled per (bucket length) and scatters KV/state into the
    target slot;
  * "prune" = freeing a slot on the host (no device work at all);
  * "concatenate" never happens — admission just fills empty slots.

All per-slot request state (sampling parameters, PRNG keys, token history,
lengths) lives in device arrays indexed by slot.
"""
