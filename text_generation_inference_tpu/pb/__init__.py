"""Generated protobuf message code for the fmaas API.

`generation_pb2.py` is produced by `protoc --python_out` from
`../proto/generation.proto` (see `scripts/gen_protos.sh`). gRPC service
wiring is hand-written in `text_generation_inference_tpu.server.grpc_server`
(the environment ships no grpc python codegen plugin, and the service surface
is small enough that explicit method handlers are clearer anyway).
"""

from . import generation_pb2  # noqa: F401
