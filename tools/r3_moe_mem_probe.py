#!/usr/bin/env python
"""Compiled-memory probe for the MoE engines — no execution, no OOM risk.

The grouped engine (both matmul backends) hit RESOURCE_EXHAUSTED on the
TPU at ViT-B b128 E=8 k=2 every=2 where the dense engine runs fine
(logs/r3_session2.log). This AOT-compiles the exact Trainer train step
per engine and prints XLA's ``memory_analysis()`` — argument / output /
temp / generated-code sizes — so the blowup is attributed without
crashing a TPU client (a dead client wedges the tunnel's grant for
minutes).

    python tools/r3_moe_mem_probe.py [--impls dense,grouped] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np


def probe(impl: str, matmul: str | None, batch: int) -> None:
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    if matmul:
        os.environ["GAVIT_MOE_MATMUL"] = matmul
    else:
        # a previous spec's backend must not leak into this one's
        # documented 'auto' resolution
        os.environ.pop("GAVIT_MOE_MATMUL", None)
    on_tpu = jax.default_backend() == "tpu"
    img = 224 if on_tpu else 32
    cfg = from_dict({
        "model": ({} if on_tpu else {"embed_dim": 64, "depth": 4,
                                     "num_heads": 2}) | {
            "name": "vit_base_16" if on_tpu else "custom",
            "img_size": img, "patch_size": 16 if on_tpu else 8,
            "num_classes": 14, "drop_rate": 0.1,
            "graph": {"enabled": True, "num_blocks": 2, "adjacency": "knn",
                      "k": 8 if on_tpu else 3, "dynamic": True},
            "moe": {"enabled": True, "num_experts": 8, "k": 2,
                    "capacity_factor": 1.25, "every": 2, "impl": impl},
        },
        "data": {"batch_size": batch, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1,
                     "precision": "bf16" if on_tpu else "fp32"},
    })
    model = build_model(cfg.model, precision=cfg.training.precision)
    params = init_params(model, jax.random.key(0))
    mesh = make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    ds = SyntheticChestXrayDataset(size=batch, image_size=img)
    loader = DataLoader(ds, batch, num_workers=0)
    trainer = Trainer(model, params, loader, loader, cfg, mesh=mesh)
    images = rng.integers(0, 256, (batch, img, img, 3), np.uint8)
    labels = (rng.random((batch, 14)) < 0.2).astype(np.float32)
    images, labels = shard_batch(mesh, (images, labels))

    # Trainer._in_mesh wraps the jit in a plain function (no .lower) on
    # multi-device meshes and for grouped-dp — lower the underlying jit
    # inside the same mesh context the wrapper would enter. (A bare jit
    # also has __wrapped__ — the raw Python fn — so key on .lower.)
    step = trainer._train_step
    if hasattr(step, "lower"):
        lowered = step.lower(trainer.state, trainer.base_rng,
                             images, labels)
    else:
        with jax.set_mesh(trainer.mesh):
            lowered = step.__wrapped__.lower(trainer.state, trainer.base_rng,
                                             images, labels)
    mem = lowered.compile().memory_analysis()
    gib = 1 << 30
    tag = f"{impl}" + (f"/{matmul}" if matmul else "")
    if mem is None:
        print(f"{tag}: memory_analysis unavailable on this backend")
        return
    print(f"{tag}: args {mem.argument_size_in_bytes / gib:.2f} GiB, "
          f"out {mem.output_size_in_bytes / gib:.2f} GiB, "
          f"temp {mem.temp_size_in_bytes / gib:.2f} GiB, "
          f"code {mem.generated_code_size_in_bytes / gib:.3f} GiB, "
          f"alias {mem.alias_size_in_bytes / gib:.2f} GiB",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="dense,grouped:ragged_dot,"
                                       "grouped:megablox")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    for spec in args.impls.split(","):
        impl, _, mm = spec.partition(":")
        probe(impl, mm or None, args.batch)


if __name__ == "__main__":
    main()
