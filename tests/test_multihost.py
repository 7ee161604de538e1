"""Live multi-host serving: step-descriptor channel + follower replay.

The reference broadcasts every Prefill/NextToken to all shard processes in
lockstep (reference: router/client/src/sharded_client.rs:34-52). Here rank 0
publishes engine-op descriptors and followers replay them
(parallel/multihost.py). These tests cover the channel + replay mechanics
in-process; scripts/dryrun_multihost.py (run by `make dryrun-multihost` /
CI) validates the full 2-process path with output parity against a
single-process run.
"""

import threading
from collections import deque

import pytest

from text_generation_inference_tpu.engine.engine import RequestParams
from text_generation_inference_tpu.parallel import multihost


class RecordingEngine:
    """Minimal engine double recording call order."""

    supports_decode_pipeline = True
    supports_chunk_override = True

    def __init__(self):
        self.calls = []
        self.free_slots = [0, 1, 2, 3]
        self._handles = 0

    def prefill(self, slots, token_ids, request_params,
                want_prompt_details=False, prefix_embeds=None):
        self.calls.append(("prefill", tuple(slots),
                           tuple(tuple(t) for t in token_ids),
                           want_prompt_details))
        return "prefill-result"

    def decode_steps_begin(self, want_details=True, chunk=None):
        self._handles += 1
        self.calls.append(("begin", want_details, chunk))
        return ("handle", self._handles)

    def decode_steps_end(self, handle):
        self.calls.append(("end", handle[1]))
        return ["steps"]

    def free(self, slot):
        self.calls.append(("free", slot))

    def reset(self):
        self.calls.append(("reset",))


def _pair(n_followers=1):
    """A connected publisher/subscriber pair over loopback."""
    import socket

    with socket.socket() as probe:
        probe.bind(("localhost", 0))
        port = probe.getsockname()[1]
    subs = []
    pub_box = {}

    def start_pub():
        pub_box["pub"] = multihost.StepPublisher(n_followers, port=port)

    t = threading.Thread(target=start_pub)
    t.start()
    for _ in range(n_followers):
        subs.append(multihost.StepSubscriber(host="localhost", port=port,
                                             connect_timeout=30))
    t.join(timeout=30)
    return pub_box["pub"], subs


class TestStepChannel:
    def test_descriptor_roundtrip_order(self):
        pub, (sub,) = _pair()
        ops = [
            (multihost.OP_PREFILL, [0], [[1, 2, 3]],
             [RequestParams(max_new_tokens=4)], False, None),
            (multihost.OP_DECODE_BEGIN, False, 8),
            (multihost.OP_DECODE_END,),
            (multihost.OP_FREE, 0),
            (multihost.OP_RESET,),
            (multihost.OP_STOP,),
        ]
        for op in ops:
            pub.send(op)
        got = [sub.recv() for _ in ops]
        assert [g[0] for g in got] == [o[0] for o in ops]
        assert got[0][3][0].max_new_tokens == 4
        assert got[1][1:] == (False, 8)
        sub.close()
        pub.close()

    def test_concurrent_senders_never_interleave_frames(self):
        pub, (sub,) = _pair()
        n_per_thread = 200

        def send_many(tag):
            for i in range(n_per_thread):
                pub.send((multihost.OP_FREE, (tag, i)))

        threads = [threading.Thread(target=send_many, args=(t,))
                   for t in range(4)]
        for t in threads:
            t.start()
        got = [sub.recv() for _ in range(4 * n_per_thread)]
        for t in threads:
            t.join()
        # every frame decodes cleanly and per-tag order is preserved
        seen = {t: -1 for t in range(4)}
        for kind, (tag, i) in got:
            assert kind == multihost.OP_FREE
            assert i == seen[tag] + 1
            seen[tag] = i
        sub.close()
        pub.close()


class TestReplicatedEngine:
    def test_ops_published_and_replayed_in_order(self):
        pub, (sub,) = _pair()
        rank0 = RecordingEngine()
        wrapped = multihost.ReplicatedEngine(rank0, pub)

        wrapped.prefill([0], [[5, 6]], [RequestParams(max_new_tokens=2)])
        h = wrapped.decode_steps_begin(want_details=False, chunk=4)
        wrapped.decode_steps_end(h)
        wrapped.free(0)
        wrapped.reset()
        wrapped.shutdown()

        follower = RecordingEngine()
        multihost.follower_loop(follower, sub)
        # the follower's decode-end drops the handle without fetching
        # (rank 0 already has the outputs), so its call log omits "end"
        assert [c for c in follower.calls] == [
            ("prefill", (0,), ((5, 6),), False),
            ("begin", False, 4),
            ("free", 0),
            ("reset",),
        ]
        assert rank0.calls[0][0] == "prefill"
        sub.close()

    def test_passthrough_host_state(self):
        pub, (sub,) = _pair()
        rank0 = RecordingEngine()
        wrapped = multihost.ReplicatedEngine(rank0, pub)
        assert wrapped.free_slots == [0, 1, 2, 3]
        assert wrapped.supports_decode_pipeline
        wrapped.shutdown()
        multihost.follower_loop(RecordingEngine(), sub)
        sub.close()

    def test_follower_handle_queue_bounded(self):
        pub, (sub,) = _pair()
        rank0 = RecordingEngine()
        wrapped = multihost.ReplicatedEngine(rank0, pub)
        for _ in range(3):
            h = wrapped.decode_steps_begin()
            wrapped.decode_steps_end(h)
        wrapped.shutdown()

        follower = RecordingEngine()
        # instrument: count outstanding handles through the loop
        orig = follower.decode_steps_begin
        outstanding = deque()

        def begin(**kw):
            outstanding.append(1)
            return orig(**kw)

        follower.decode_steps_begin = begin
        multihost.follower_loop(follower, sub)
        assert len([c for c in follower.calls if c[0] == "begin"]) == 3
        sub.close()


@pytest.mark.slow
class TestTwoProcessServing:
    def test_dryrun_phase_b(self, tmp_path):
        """The full 2-process serving path: real Batcher + engine on a
        global mesh, follower replay, output parity vs single-process.
        Runs scripts/dryrun_multihost.py phase B in subprocesses."""
        import json
        import os
        import subprocess
        import sys

        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "dryrun_multihost.py")
        from tests import fixtures

        fixtures.tokenized_model_dir()   # ensure the served fixture exists
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        env.pop("XLA_FLAGS", None)

        ref = tmp_path / "ref.json"
        rc = subprocess.run(
            [sys.executable, script, "ref", str(ref)], env=env,
            timeout=600).returncode
        assert rc == 0

        import socket

        def free_port():
            with socket.socket() as s:
                s.bind(("localhost", 0))
                return s.getsockname()[1]

        out = tmp_path / "out.json"
        port, step_port = free_port(), free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, script, "serve", str(pid), str(port),
                 str(step_port), str(out)], env=env)
            for pid in range(2)
        ]
        codes = [p.wait(timeout=600) for p in procs]
        assert codes == [0, 0], codes

        ref_rows = json.loads(ref.read_text())
        out_rows = json.loads(out.read_text())

        def strip(rows):
            return [{k: v for k, v in r.items() if k != "logprobs"}
                    for r in rows]

        assert strip(ref_rows) == strip(out_rows)
        for a, b in zip(ref_rows, out_rows):
            for x, y in zip(a["logprobs"], b["logprobs"]):
                assert abs(x - y) <= 5e-4 * max(abs(x), abs(y))
