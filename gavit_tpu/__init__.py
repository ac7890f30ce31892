"""gavit_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Graph-Augmented Vision Transformers.

Re-designed from scratch for TPU hardware with the same capabilities as the
PyTorch reference (ghazalehmirzaee/Graph-Augmented-Vision-Transformers):
multi-label thoracic-disease classification with a ViT backbone, a learnable
weighted combination of WBCE/Focal/Asymmetric losses, full training /
evaluation / visualization tooling — plus the graph branch (patch-token
adjacency + message passing) and data-parallel scaling over ICI that the
reference never implemented.

Layout:
  models/    — Flax ViT + graph message-passing blocks
  ops/       — Pallas TPU kernels (fused attention, fused graph op) and the
               fused XLA preprocessing graph
  parallel/  — device mesh construction and sharding rules
  training/  — losses, LR schedules, optimizer wiring, the Trainer
  data/      — ChestX-ray14 dataset, host loader, device-side augmentation
  utils/     — metrics, checkpointing, logging, visualization, Grad-CAM
"""

__version__ = "0.1.0"

from gavit_tpu.config import Config, load_config  # noqa: F401
