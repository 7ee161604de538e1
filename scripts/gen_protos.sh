#!/usr/bin/env bash
# Regenerate protobuf message code. Run from the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."
protoc \
  --proto_path=text_generation_inference_tpu/proto \
  --python_out=text_generation_inference_tpu/pb \
  text_generation_inference_tpu/proto/generation.proto \
  text_generation_inference_tpu/proto/generate.proto
echo "wrote text_generation_inference_tpu/pb/generation_pb2.py"
echo "wrote text_generation_inference_tpu/pb/generate_pb2.py"
