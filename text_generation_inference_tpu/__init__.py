"""text_generation_inference_tpu — a TPU-native text-generation serving framework.

Capabilities mirror IBM/text-generation-inference (TGIS): a gRPC
`fmaas.GenerationService` front-end with unary/batched/streaming generation and
tokenization APIs, continuous batching with memory-model-driven admission
control, server-side incremental detokenization and stop-sequence evaluation,
per-request sampling parameters with reproducible seeds, PEFT tuned-prompt
injection, and Prometheus metrics.

The architecture is NOT the reference's launcher/router/N-shard-process
design. On TPU a single-controller JAX process owns every local chip;
tensor-parallel execution is expressed as GSPMD shardings over a
`jax.sharding.Mesh`, so the reference's per-GPU shard processes, UDS gRPC
fan-out (reference: router/client/src/sharded_client.rs) and
torch.distributed plumbing (reference: server/.../utils/dist.py) collapse
into mesh construction. Layers:

  server/     gRPC + HTTP front-end, request validation
  scheduler/  continuous-batching queue, admission cost model, batcher loop
  engine/     slot-based static-shape inference engine, KV cache, sampling
  models/     pure-JAX model families (llama, gpt2, bloom, neox, bigcode, t5, ...)
  ops/        attention + Pallas TPU kernels + quantized matmul
  parallel/   device mesh + PartitionSpecs (tensor parallelism)
  utils/      incremental detokenizer, prompt cache, metrics, weights loader
"""

__version__ = "0.1.0"
