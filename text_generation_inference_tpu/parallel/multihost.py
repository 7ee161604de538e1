"""Live multi-host serving: rank-0 front-end + follower step loops.

The reference serves across shard processes by broadcasting every Prefill /
NextToken RPC to all shards in lockstep (reference:
router/client/src/sharded_client.rs:34-52; the launcher wires the rank env
contract, launcher/src/main.rs:691-702). The TPU equivalent under
multi-controller JAX: every process must execute the SAME jitted calls in
the SAME order so the GSPMD collectives inside them line up — but only
rank 0 runs the gRPC front-end and the Batcher, so only rank 0 knows what
the next step is.

This module closes that gap with a step-descriptor channel:

  * rank 0 wraps its engine in :class:`ReplicatedEngine`; before executing
    any device-touching op (prefill / decode dispatch / decode fetch /
    slot free / reset) it publishes a tiny descriptor — op kind plus the
    host-side arguments (token ids, slots, sampling params, chunk length)
    — to every follower over a TCP side channel;
  * ranks 1..N-1 run :func:`follower_loop`: receive descriptors and replay
    the identical call on their own engine instance. All engine host state
    (slot lists, page allocator, context mirrors) is a deterministic
    function of the op stream, so followers stay in lockstep and their
    devices meet rank 0's in every collective.

The channel is host-side control plane only (a few hundred bytes per step,
amortized over `decode_chunk` tokens); all tensor traffic stays on ICI/DCN
inside the jitted steps. This mirrors the reference's split: gRPC carries
token ids and control, NCCL carries activations.

Deployment contract (see README "Multi-host serving"): every host runs the
same `serve` binary with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set (the reference's RANK / WORLD_SIZE / MASTER_ADDR
contract); rank 0 additionally binds the step channel on
MULTIHOST_STEP_PORT (default 18099) on its coordinator interface.

Validated end-to-end (real Batcher + engine over 2 processes, outputs
byte-identical to a single-process run on the same virtual mesh) by
scripts/dryrun_multihost.py.
"""

from __future__ import annotations

import logging
import os
import pickle
import socket
import struct
import threading
import time
from collections import deque

logger = logging.getLogger(__name__)

_LEN = struct.Struct("!I")

# ops that mutate device state and therefore must reach followers in
# exactly the order rank 0 executes them
OP_PREFILL = "prefill"
OP_DECODE_BEGIN = "begin"
OP_DECODE_END = "end"
OP_FREE = "free"
OP_RESET = "reset"
OP_STOP = "stop"


def step_port() -> int:
    return int(os.getenv("MULTIHOST_STEP_PORT", "18099"))


def coordinator_host() -> str:
    addr = os.getenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    return addr.rsplit(":", 1)[0]


class StepPublisher:
    """Rank 0 side of the step channel: accepts one connection per
    follower, then broadcasts length-prefixed pickled descriptors.

    `send` is locked so descriptors from the batcher's event-loop thread
    and its executor thread cannot interleave mid-frame; the caller holds
    the same lock across send + local engine dispatch for order-critical
    ops (ReplicatedEngine), so the stream order always equals rank 0's
    device dispatch order."""

    def __init__(self, n_followers: int, port: int | None = None,
                 accept_timeout: float = 300.0):
        self._lock = threading.Lock()
        self._socks: list[socket.socket] = []
        if n_followers == 0:
            return
        port = step_port() if port is None else port
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("", port))
        srv.listen(n_followers)
        srv.settimeout(accept_timeout)
        logger.info("multihost: waiting for %d follower(s) on step port %d",
                    n_followers, port)
        try:
            for _ in range(n_followers):
                conn, addr = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                self._socks.append(conn)
                logger.info("multihost: follower connected from %s", addr)
        finally:
            srv.close()

    def send(self, op: tuple) -> None:
        payload = pickle.dumps(op, protocol=pickle.HIGHEST_PROTOCOL)
        frame = _LEN.pack(len(payload)) + payload
        with self._lock:
            for s in self._socks:
                s.sendall(frame)

    def close(self) -> None:
        try:
            self.send((OP_STOP,))
        except Exception:
            pass
        for s in self._socks:
            try:
                s.close()
            except Exception:
                pass


class StepSubscriber:
    """Follower side: connect to rank 0 (with retry — rank 0 may still be
    loading weights) and yield descriptors."""

    def __init__(self, host: str | None = None, port: int | None = None,
                 connect_timeout: float = 300.0):
        host = coordinator_host() if host is None else host
        port = step_port() if port is None else port
        deadline = time.monotonic() + connect_timeout
        last_err: Exception | None = None
        while True:
            try:
                self._sock = socket.create_connection((host, port), timeout=10)
                self._sock.setsockopt(socket.IPPROTO_TCP,
                                      socket.TCP_NODELAY, 1)
                break
            except OSError as e:
                last_err = e
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not reach rank-0 step channel {host}:{port}"
                    ) from last_err
                time.sleep(0.5)
        logger.info("multihost: connected to rank-0 step channel %s:%d",
                    host, port)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("rank-0 step channel closed")
            buf += chunk
        return buf

    def recv(self) -> tuple:
        (n,) = _LEN.unpack(self._recv_exact(_LEN.size))
        return pickle.loads(self._recv_exact(n))

    def close(self) -> None:
        try:
            self._sock.close()
        except Exception:
            pass


class ReplicatedEngine:
    """Rank-0 engine wrapper: every device-touching op is published to the
    followers immediately before the local call, under one lock, so the
    descriptor stream order equals rank 0's dispatch order and every
    process executes the identical jitted-call sequence (the lockstep
    invariant of the reference's ShardedClient broadcast,
    sharded_client.rs:34-52).

    Host-only bookkeeping (acquire_slot, has_capacity, free_slots,
    allocator reads) passes straight through: followers reconstruct the
    same state by replaying the op stream."""

    def __init__(self, engine, publisher: StepPublisher):
        self._engine = engine
        self._pub = publisher
        # serializes (send + dispatch) for order-critical ops
        self._order = threading.Lock()

    # passthrough for everything not explicitly wrapped (spec, config,
    # eos_token_id, free_slots, allocator, num_active, last_forward_ns,
    # supports_* flags, acquire_slot, has_capacity, ...)
    def __getattr__(self, name):
        return getattr(self._engine, name)

    # -- broadcast ops ------------------------------------------------------

    def prefill(self, slots, token_ids, request_params,
                want_prompt_details=False, prefix_embeds=None):
        with self._order:
            self._pub.send((OP_PREFILL, slots, token_ids, request_params,
                            want_prompt_details, prefix_embeds))
            return self._engine.prefill(
                slots, token_ids, request_params,
                want_prompt_details=want_prompt_details,
                prefix_embeds=prefix_embeds)

    def decode_steps_begin(self, want_details=True, chunk=None):
        with self._order:
            self._pub.send((OP_DECODE_BEGIN, want_details, chunk))
            return self._engine.decode_steps_begin(
                want_details=want_details, chunk=chunk)

    def decode_steps_end(self, handle):
        # order-insensitive for device state (pure fetch); the send keeps
        # the follower's outstanding-handle queue bounded
        self._pub.send((OP_DECODE_END,))
        return self._engine.decode_steps_end(handle)

    def decode_steps(self, want_details=True, chunk=None):
        return self.decode_steps_end(
            self.decode_steps_begin(want_details, chunk=chunk))

    def decode(self):
        return self.decode_steps()[0]

    def free(self, slot: int) -> None:
        # the device-side effect of a free lands at the NEXT engine call
        # (_apply_pending_frees); publishing it in stream order guarantees
        # the follower drains the same pending set at the same call
        with self._order:
            self._pub.send((OP_FREE, slot))
            self._engine.free(slot)

    def reset(self) -> None:
        with self._order:
            self._pub.send((OP_RESET,))
            self._engine.reset()

    def shutdown(self) -> None:
        self._pub.close()


def _replay(fn, *args, **kwargs):
    """Execute one replayed engine op; a device failure here also failed
    the same program on rank 0, which will publish OP_RESET next — survive
    it so that reset can be received and applied."""
    from ..engine.engine import EngineDeviceError

    try:
        return fn(*args, **kwargs)
    except EngineDeviceError:
        logger.exception("multihost follower: device step failed; awaiting "
                         "rank-0 reset")
        return None


def follower_loop(engine, subscriber: StepSubscriber) -> None:
    """Ranks 1..N-1: replay rank 0's op stream on the local engine replica.

    Outputs are discarded — follower devices participate in every
    collective inside the jitted steps, which is their entire purpose
    (the reference's non-master shards likewise compute every token and
    return results nobody reads, server.py Prefill on every shard)."""
    handles: deque = deque()
    n_ops = 0
    while True:
        op = subscriber.recv()
        kind = op[0]
        if kind == OP_STOP:
            logger.info("multihost follower: stop after %d ops", n_ops)
            return
        n_ops += 1
        if kind == OP_PREFILL:
            _, slots, token_ids, request_params, want_details, embeds = op
            _replay(engine.prefill, slots, token_ids, request_params,
                    want_prompt_details=want_details,
                    prefix_embeds=embeds)
        elif kind == OP_DECODE_BEGIN:
            _, want_details, chunk = op
            h = _replay(engine.decode_steps_begin,
                        want_details=want_details, chunk=chunk)
            if h is not None:
                handles.append(h)
        elif kind == OP_DECODE_END:
            if handles:
                # drop the oldest handle without fetching: the fetch is a
                # host read of replicated outputs — rank 0 already has
                # them, and skipping it keeps the follower from lagging a
                # full host-fetch RTT behind every chunk
                handles.popleft()
        elif kind == OP_FREE:
            engine.free(op[1])
        elif kind == OP_RESET:
            handles.clear()
            engine.reset()
        else:
            raise ValueError(f"unknown multihost op {kind!r}")
