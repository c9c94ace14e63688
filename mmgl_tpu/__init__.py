"""MMGL-TPU: a TPU-native JAX framework for multimodal graph learning.

Re-implements the capabilities of minjiyoon/MMGL (arXiv:2310.07478) —
fine-tuning pretrained LMs for WikiWeb2M section summarization with
multimodal neighbor context — as an idiomatic JAX/XLA/Pallas/pjit stack.

Layer map (see SURVEY.md for the reference analysis this is built to):
  config      — public argument surface (parity with run_generation.py:66-229)
  data        — ETL, O(1) page store, fixed-shape sample assembly, prefetch loader
  models      — flax LMs (OPT/T5/MPT) + frozen towers (Roberta/CLIP) + graph PE
  ops         — Pallas fused attention kernels + XLA fallbacks
  peft        — parameter-partition masks & adapter params (lora/prefix/prompt/flamingo)
  parallel    — device mesh + sharding rules (DP/TP over ICI)
  train       — jitted train/eval steps, generation, checkpoints, meters
  metrics     — BLEU / ROUGE / CIDEr (numpy, parity with reference scorers)
"""

__version__ = "0.1.0"

from mmgl_tpu.config import Arguments, parse_args  # noqa: F401
