#!/usr/bin/env python
"""Training-throughput benchmark: images/sec/chip on ViT-B/16 + graph.

Runs the full jitted training step (device-side augmentation + forward with
Pallas kernels + loss + backward + optimizer update, donated state) on
synthetic device-resident uint8 batches and reports sustained throughput.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
   "vs_baseline": N / 2000.0}
(baseline: the BASELINE.json north-star target of 2,000 img/s/chip sustained
at ViT-B/16+graph on v5e — the reference publishes no numbers of its own.)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    on_tpu = jax.default_backend() == "tpu"
    n_chips = jax.device_count()
    batch_per_chip = 128 if on_tpu else 8
    img = 224 if on_tpu else 64
    patch = 16 if on_tpu else 16
    batch = batch_per_chip * n_chips

    cfg = from_dict({
        "model": {
            "name": "vit_base_16" if on_tpu else "vit_tiny_16",
            "img_size": img, "patch_size": patch,
            "num_classes": 14, "drop_rate": 0.1,
            "graph": {"enabled": True, "num_blocks": 2, "adjacency": "knn",
                      "k": 8, "dynamic": True},
        },
        "data": {"batch_size": batch, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1,
                     "precision": "bf16" if on_tpu else "fp32"},
    })
    log(f"bench: {cfg.model.name}+graph2 batch={batch} img={img} "
        f"chips={n_chips} backend={jax.default_backend()}")

    mesh = make_mesh(cfg.mesh)
    model = build_model(cfg.model, precision=cfg.training.precision)
    params = init_params(model, jax.random.key(0))

    ds = SyntheticChestXrayDataset(size=batch, image_size=img)
    loader = DataLoader(ds, batch, num_workers=2)
    trainer = Trainer(model, params, loader, loader, cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, img, img, 3), np.uint8)
    labels = (rng.random((batch, 14)) < 0.2).astype(np.float32)
    images, labels = shard_batch(mesh, (images, labels))

    state = trainer.state
    # warmup/compile
    t0 = time.perf_counter()
    state, metrics, preds = trainer._train_step(state, trainer.base_rng,
                                                images, labels)
    jax.block_until_ready(preds)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    n_steps = 30 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics, preds = trainer._train_step(state, trainer.base_rng,
                                                    images, labels)
    jax.block_until_ready(preds)
    elapsed = time.perf_counter() - t0
    ips = batch * n_steps / elapsed
    ips_chip = ips / n_chips
    log(f"{n_steps} steps in {elapsed:.2f}s → {ips:.0f} img/s total, "
        f"{ips_chip:.0f} img/s/chip")

    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(ips_chip, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ips_chip / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
