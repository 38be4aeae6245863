"""mantis_tpu — a TPU-native (JAX/XLA/Pallas) framework for interleaved
multi-image vision-language models, with the capabilities of
TIGER-AI-Lab/Mantis (training, eval, inference for MLlava-family VLMs).

Subpackages:
  models      — functional JAX model definitions + conversation templating
  ops         — Pallas TPU kernels (flash attention, ring attention, quant)
  parallel    — mesh construction and sharding rules (data/fsdp/context axes)
  generation  — jitted prefill/decode loops with KV cache
  train       — data pipeline, SFT trainer, LoRA, checkpoints
  io          — HuggingFace checkpoint interop (safetensors -> JAX pytrees)
  benchmark   — Mantis eval harness (Mantis-Eval, NLVR2, Q-Bench2, MVBench, ...)
"""

__version__ = "0.1.0"
