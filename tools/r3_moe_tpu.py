#!/usr/bin/env python
"""MoE training/inference throughput on the TPU (BASELINE.md row).

ViT-B/16 + graph2 with MoE MLPs in every other block (E=8, k=2,
cf=1.25 — configs/examples/vit_b16_moe.yaml at mesh 1×1), bf16, b128
training / b64 inference, against the dense model's measured 918/3515
img/s/chip. k=2 routing doubles the MoE blocks' MLP FLOPs per token and
adds the dispatch/combine contractions, so the step is expected SLOWER
than dense at equal token count — the family exists for quality-per-FLOP
at scale (8× MLP params in 6 blocks for ~1 dense block's extra compute);
this records what the dial costs on one chip.

``--impl grouped`` measures the dropless grouped-GEMM engine
(ops/moe_grouped.py) instead; ``GAVIT_MOE_MATMUL=ragged_dot|megablox``
selects its ragged-matmul backend.

Run detached: nohup python tools/r3_moe_tpu.py >> logs/r3_moe_tpu.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="dense",
                    choices=["dense", "grouped"])
    ap.add_argument("--experts", type=int, default=8,
                    help="expert count (r4 scaling probe: the dense "
                         "engine's dispatch/combine cost grows with E; "
                         "the grouped engine computes exact rows at any E)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the train batch (default 128 TPU / 8 CPU)")
    ap.add_argument("--no-remat", action="store_true",
                    help="grouped_remat=false: store the ragged-GEMM "
                         "residuals instead of recomputing (r4: the "
                         "machinery fixes shrank temps — probe whether the "
                         "non-remat program fits again)")
    args = ap.parse_args()
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    on_tpu = jax.default_backend() == "tpu"
    img = 224 if on_tpu else 32
    patch = 16 if on_tpu else 8
    name = "vit_base_16" if on_tpu else "custom"
    train_batch = args.batch or (128 if on_tpu else 8)
    n_steps = 20 if on_tpu else 3

    cfg = from_dict({
        "model": ({} if on_tpu else {"embed_dim": 64, "depth": 4,
                                     "num_heads": 2}) | {
            "name": name, "img_size": img, "patch_size": patch,
            "num_classes": 14, "drop_rate": 0.1,
            "graph": {"enabled": True, "num_blocks": 2, "adjacency": "knn",
                      "k": 8 if on_tpu else 3, "dynamic": True},
            "moe": {"enabled": True, "num_experts": args.experts, "k": 2,
                    "capacity_factor": 1.25, "every": 2,
                    "impl": args.impl,
                    "grouped_remat": not args.no_remat},
        },
        "data": {"batch_size": train_batch, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1,
                     "precision": "bf16" if on_tpu else "fp32"},
    })
    model = build_model(cfg.model, precision=cfg.training.precision)
    params = init_params(model, jax.random.key(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    from gavit_tpu.ops.moe_grouped import resolve_matmul_impl

    detail = (f" matmul={resolve_matmul_impl()}"
              if args.impl == "grouped" else "")
    print(f"moe bench: {name} impl={args.impl}{detail} E={args.experts} k=2 every=2 "
          f"img={img} b{train_batch} params={n_params / 1e6:.1f}M "
          f"backend={jax.default_backend()}", flush=True)

    mesh = make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    ds = SyntheticChestXrayDataset(size=train_batch, image_size=img)
    loader = DataLoader(ds, train_batch, num_workers=0)
    trainer = Trainer(model, params, loader, loader, cfg, mesh=mesh)
    images = rng.integers(0, 256, (train_batch, img, img, 3), np.uint8)
    labels = (rng.random((train_batch, 14)) < 0.2).astype(np.float32)
    images, labels = shard_batch(mesh, (images, labels))

    state = trainer.state
    t0 = time.perf_counter()
    state, metrics, _ = trainer._train_step(state, trainer.base_rng,
                                            images, labels)
    _ = float(metrics["loss"])
    print(f"train compile+1st: {time.perf_counter() - t0:.0f}s "
          f"loss {float(metrics['loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics, _ = trainer._train_step(state, trainer.base_rng,
                                                images, labels)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(f"MoE train b{train_batch}: {dt * 1000:.1f} ms/step -> "
          f"{train_batch / dt:.0f} img/s/chip", flush=True)

    # inference (serving path shape: deterministic apply on bf16)
    infer_batch = 64 if on_tpu else 8
    u8 = jnp.asarray(rng.integers(0, 256, (infer_batch, img, img, 3),
                                  np.uint8))
    from gavit_tpu.ops.preprocess import val_preprocess

    @jax.jit
    def infer(p, u8):
        x = val_preprocess(u8)
        return jax.nn.sigmoid(model.apply({"params": p}, x,
                                          deterministic=True))

    probs = infer(state.params["model"], u8)
    _ = float(jnp.sum(probs))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        probs = infer(state.params["model"], u8)
    _ = float(jnp.sum(probs))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"MoE infer b{infer_batch}: {dt * 1000:.1f} ms/batch -> "
          f"{infer_batch / dt:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
