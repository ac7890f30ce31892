#!/usr/bin/env python
"""1024px (N=4097) ViT-B+graph2 TRAINING step on one chip: v5 blockwise
attention backward + chunked-graph rematerialised backward + megakernel
MLP fallback behavior at the 4097-token count.

Run detached: nohup python tools/r5_1024_train.py >> logs/r5_1024_train.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    on_tpu = jax.default_backend() == "tpu"
    img = 1024 if on_tpu else 32
    bs = 2 if on_tpu else 4
    steps = 10 if on_tpu else 2
    cfg = from_dict({
        "model": ({} if on_tpu else {"embed_dim": 64, "depth": 2,
                                     "num_heads": 2}) | {
            "name": "vit_base_16" if on_tpu else "custom",
            "img_size": img, "patch_size": 16 if on_tpu else 8,
            "num_classes": 14, "drop_rate": 0.1,
            # remat: the [B,4097,*] residuals of 12 blocks exceed HBM
            # without it at any useful batch
            "remat": bool(on_tpu),
            "graph": {"enabled": True, "num_blocks": 2, "adjacency": "knn",
                      "k": 8 if on_tpu else 3, "dynamic": True}},
        "data": {"batch_size": bs, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1,
                     "precision": "bf16" if on_tpu else "fp32"},
    })
    model = build_model(cfg.model, precision=cfg.training.precision)
    params = init_params(model, jax.random.key(0))
    mesh = make_mesh(cfg.mesh)
    ds = SyntheticChestXrayDataset(size=bs, image_size=img)
    loader = DataLoader(ds, bs, num_workers=0)
    tr = Trainer(model, params, loader, loader, cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, (
        rng.integers(0, 256, (bs, img, img, 3), np.uint8),
        (rng.random((bs, 14)) < 0.2).astype(np.float32)))
    state = tr.state
    t0 = time.perf_counter()
    state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    print(f"1024px train compile+1st {time.perf_counter()-t0:.0f}s "
          f"loss {float(m['loss']):.4f}", flush=True)
    for _ in range(2):
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"1024px ViT-B+graph2 train b{bs}: {ms:.1f} ms/step -> "
          f"{bs / ms * 1000:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
