#!/usr/bin/env python
"""r5 closing probes:

1. ViT-L + grouped MoE on the fused megakernel (D=1024/F=4096 — the
   weight pair is 16.8 MB so the kernel rides the minimal-VMEM-raise
   policy like the dense ViT-L megakernel did): train b64 fused vs
   unfused vs dense.
2. 1024px ViT-B+graph2 forward (N=4097) on ONE chip — v5 blockwise
   attention + chunked graph, the north-star token count end to end.

Run detached: nohup python tools/r5_misc_probe.py >> logs/r5_misc.log 2>&1 &
"""

from __future__ import annotations

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
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    print(f"r5 misc probe backend={jax.default_backend()}", flush=True)

    run_1024px(on_tpu, rng)

    # --- 1. ViT-L + MoE engines (E=4 — E=8's 930M params x 3 fp32 copies
    # exceed one 16 GiB chip; see BASELINE.md row) ------------------------
    name = "vit_large_16" if on_tpu else "custom"
    img = 224 if on_tpu else 32
    bs = 32 if on_tpu else 8
    steps = 15 if on_tpu else 2
    for label, impl, fused in (("grouped-fused", "grouped", "1"),
                               ("grouped-unfused", "grouped", "0"),
                               ("dense", "dense", "1")):
        os.environ["GAVIT_MOE_FUSED"] = fused
        cfg = from_dict({
            "model": ({} if on_tpu else {"embed_dim": 64, "depth": 4,
                                         "num_heads": 2}) | {
                "name": name, "img_size": img,
                "patch_size": 16 if on_tpu else 8,
                "num_classes": 14, "drop_rate": 0.1,
                "graph": {"enabled": True, "num_blocks": 2,
                          "adjacency": "knn", "k": 8 if on_tpu else 3},
                "moe": {"enabled": True, "num_experts": 4, "k": 2,
                        "every": 2, "impl": impl,
                        "grouped_remat": True}},
            "data": {"batch_size": bs, "image_size": img},
            "training": {"epochs": 10, "warmup_epochs": 1,
                         "precision": "bf16" if on_tpu else "fp32"},
        })
        try:
            _run_leg(cfg, label, bs, img, steps, rng)
        except Exception as e:
            print(f"[vitL-moe {label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    os.environ.pop("GAVIT_MOE_FUSED", None)



def _run_leg(cfg, label, bs, img, steps, rng):
    import time

    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    if True:
        model = build_model(cfg.model, precision=cfg.training.precision)
        params = init_params(model, jax.random.key(0))
        mesh = make_mesh(cfg.mesh)
        ds = SyntheticChestXrayDataset(size=bs, image_size=img)
        loader = DataLoader(ds, bs, num_workers=0)
        tr = Trainer(model, params, loader, loader, cfg, mesh=mesh)
        batch = shard_batch(mesh, (
            rng.integers(0, 256, (bs, img, img, 3), np.uint8),
            (rng.random((bs, 14)) < 0.2).astype(np.float32)))
        state = tr.state
        t0 = time.perf_counter()
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
        _ = float(m["loss"])
        print(f"[vitL-moe {label}] compile+1st {time.perf_counter()-t0:.0f}s",
              flush=True)
        for _ in range(3):
            state, m, _ = tr._train_step(state, tr.base_rng, *batch)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m, _ = tr._train_step(state, tr.base_rng, *batch)
        _ = float(m["loss"])
        ms = (time.perf_counter() - t0) / steps * 1000
        print(f"[vitL-moe {label}] train b{bs}: {ms:.1f} ms/step -> "
              f"{bs / ms * 1000:.0f} img/s/chip", flush=True)


def run_1024px(on_tpu, rng):
    import time

    import gavit_tpu  # noqa: F401
    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params

    # --- 2. 1024px ViT-B+graph2 forward (N=4097) ---------------------------
    if not on_tpu:
        print("cpu smoke done (1024px section is TPU-only)", flush=True)
        return
    cfg = from_dict({
        "model": {"name": "vit_base_16", "img_size": 1024, "patch_size": 16,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8, "dynamic": True}},
    })
    model = build_model(cfg.model, precision="bf16")
    params = init_params(model, jax.random.key(0))
    for b in (1, 2):
        x = jnp.asarray(rng.standard_normal((b, 1024, 1024, 3)), jnp.float32)

        @jax.jit
        def apply(p, x):
            return model.apply({"params": p}, x, deterministic=True)

        t0 = time.perf_counter()
        out = apply(params, x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        print(f"1024px ViT-B+graph2 b{b} compile+1st "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out = apply(params, x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / 10 * 1000
        print(f"1024px ViT-B+graph2 (N=4097) b{b} forward {ms:.1f} ms -> "
              f"{b / ms * 1000:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
