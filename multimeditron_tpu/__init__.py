"""multimeditron_tpu — a TPU-native multimodal LLM framework.

Brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
EPFLiGHT/MultiMeditron (reference surveyed in /root/repo/SURVEY.md):
pluggable modality encoders spliced into a causal LLM's token-embedding
stream at attachment-token positions, staged SFT training on GSPMD meshes,
compiled continuous-batching generation, GRPO RLHF, and dataset tooling.

Design notes (TPU-first, not a port):
- Models are pure functions over parameter pytrees (no stateful nn.Module);
  every hot path is a single jitted XLA graph.
- Parallelism is GSPMD: a ``jax.sharding.Mesh`` with (dp, fsdp, tp) axes and
  NamedSharding param rules replace DeepSpeed/NCCL.
- Attention is a Pallas flash-attention kernel (TPU MXU-tiled) with a pure
  XLA fallback for CPU testing.
"""

__version__ = "0.1.0"
