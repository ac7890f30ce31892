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

import os as _os


def setup_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (full train-step compiles
    take minutes on tunneled TPU backends; the cache makes re-runs instant).
    Called by the CLIs and bench; safe to call multiple times."""
    import jax

    cache_dir = path or _os.environ.get(
        "GAVIT_COMPILE_CACHE", _os.path.expanduser("~/.gavit_jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # older jax without these options
        pass


from gavit_tpu.config import Config, load_config  # noqa: F401
