#!/usr/bin/env python
"""QAT at flagship scale (VERDICT r4 #7).

Two measurements the r4 toy A/B (`tools/r4_qat_ab.py`) left open:

1. **Train-step cost** of ``training.qat: true`` at ViT-B/16+graph2 b128
   bf16 — the fake-quant sites ride every GEMM the int8 server quantises.
2. **int8-served deviation + AUC at that scale** on the learnable
   synthetic task: train plain vs QAT for the same (short) budget, serve
   both int8, compare probability deviation vs each model's own fp
   forward and the val AUC under each serving mode.

Run detached: nohup python tools/r5_qat_vitb.py >> logs/r5_qat_vitb.log 2>&1 &
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
    from gavit_tpu.ops.preprocess import val_preprocess
    from gavit_tpu.serving import calibrate_int8, export_quant
    from gavit_tpu.training import Trainer
    from gavit_tpu.utils.metrics import MetricCalculator

    on_tpu = jax.default_backend() == "tpu"
    img = 224 if on_tpu else 32
    name = "vit_base_16" if on_tpu else "custom"
    bs = 128 if on_tpu else 16
    epochs = int(os.environ.get("QAT_VITB_EPOCHS", "4" if on_tpu else "2"))
    train_n = 2048 if on_tpu else 64
    precision = "bf16" if on_tpu else "fp32"
    print(f"QAT flagship A/B: {name} img={img} b{bs} {precision} "
          f"epochs={epochs} backend={jax.default_backend()}", flush=True)

    def make_cfg(qat: bool, save_dir: str):
        return from_dict({
            "model": ({} if on_tpu else {"embed_dim": 64, "depth": 2,
                                         "num_heads": 2}) | {
                "name": name, "img_size": img,
                "patch_size": 16 if on_tpu else 8,
                "num_classes": 14, "drop_rate": 0.1,
                "graph": {"enabled": True, "num_blocks": 2,
                          "adjacency": "knn", "k": 8 if on_tpu else 3}},
            "data": {"batch_size": bs, "image_size": img},
            "training": {"epochs": epochs, "warmup_epochs": 1,
                         "precision": precision, "qat": qat,
                         "learning_rate": 3e-4, "log_every": 1000},
            "paths": {"save_dir": save_dir, "log_dir": save_dir + "/logs"},
        })

    tr_ds = SyntheticChestXrayDataset(size=train_n, image_size=img, seed=0,
                                      learnable=True)
    va_n = 256 if on_tpu else 64
    va_ds = SyntheticChestXrayDataset(size=va_n, image_size=img, seed=1,
                                      learnable=True)
    val_imgs = np.stack([np.asarray(va_ds[i][0]) for i in range(va_n)])
    val_labels = np.stack([np.asarray(va_ds[i][1]) for i in range(va_n)])
    mc = MetricCalculator(va_ds.disease_names)
    x_val = val_preprocess(jnp.asarray(val_imgs, jnp.uint8))

    def auc_of(probs):
        return mc.calculate_metrics(val_labels, np.asarray(probs,
                                                           np.float32))["mean_auc"]

    def step_cost(trainer, batch):
        # deep copy: the jitted step DONATES the state; the trainer must
        # keep its own buffers for the real training run below
        state = jax.tree.map(jnp.copy, trainer.state)
        t0 = time.perf_counter()
        state, m, _ = trainer._train_step(state, trainer.base_rng, *batch)
        _ = float(m["loss"])
        print(f"  compile+1st {time.perf_counter() - t0:.0f}s", flush=True)
        for _ in range(3):
            state, m, _ = trainer._train_step(state, trainer.base_rng,
                                              *batch)
        _ = float(m["loss"])
        n = 20 if on_tpu else 2
        t0 = time.perf_counter()
        for _ in range(n):
            state, m, _ = trainer._train_step(state, trainer.base_rng,
                                              *batch)
        _ = float(m["loss"])
        return (time.perf_counter() - t0) / n * 1000

    from gavit_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(None)
    rng = np.random.default_rng(0)
    bench_batch = shard_batch(mesh, (
        rng.integers(0, 256, (bs, img, img, 3), np.uint8),
        (rng.random((bs, 14)) < 0.2).astype(np.float32)))

    results = {}
    for qat in (False, True):
        tag = "qat" if qat else "plain"
        cfg = make_cfg(qat, f"/tmp/r5_qat/{tag}")
        model = build_model(cfg.model, precision=precision)
        params = init_params(model, jax.random.key(0))
        tl = DataLoader(tr_ds, bs, shuffle=True, num_workers=0)
        vl = DataLoader(va_ds, bs, num_workers=0)
        trainer = Trainer(model, params, tl, vl, cfg)
        ms = step_cost(trainer, bench_batch)
        print(f"[{tag}] train step {ms:.1f} ms -> {bs / ms * 1000:.0f} "
              f"img/s/chip", flush=True)
        res = trainer.train()
        print(f"[{tag}] trained {epochs} epochs: best val AUC "
              f"{res['best_val_auc']:.4f}", flush=True)
        results[tag] = trainer

    # plain -> PTQ serving
    t = results["plain"]
    params = jax.device_get(t.state.params["model"])
    fp_probs = jax.nn.sigmoid(t.model.apply(
        {"params": params}, x_val, deterministic=True).astype(jnp.float32))
    int8_model = build_model(t.config.model, precision="int8")
    quant = calibrate_int8(int8_model, params, x_val[:32])
    ptq_probs = jax.nn.sigmoid(int8_model.apply(
        {"params": params, **quant}, x_val,
        deterministic=True).astype(jnp.float32))
    ptq_dev = float(jnp.max(jnp.abs(ptq_probs - fp_probs)))
    print(f"[plain] fp AUC {auc_of(fp_probs):.4f} | int8-PTQ AUC "
          f"{auc_of(ptq_probs):.4f} | max prob dev {ptq_dev:.4f}",
          flush=True)

    # QAT -> int8 serving
    t = results["qat"]
    params = jax.device_get(t.state.params["model"])
    scales = jax.device_get(t._quant)
    qat_fp = jax.nn.sigmoid(t.model.apply(
        {"params": params, **scales}, x_val,
        deterministic=True).astype(jnp.float32))
    int8_model = t.model.clone(quant="int8")
    quant = export_quant(params, scales)
    qat_int8 = jax.nn.sigmoid(int8_model.apply(
        {"params": params, **quant}, x_val,
        deterministic=True).astype(jnp.float32))
    qat_dev = float(jnp.max(jnp.abs(qat_int8 - qat_fp)))
    print(f"[qat]   fp(fake-quant) AUC {auc_of(qat_fp):.4f} | int8 AUC "
          f"{auc_of(qat_int8):.4f} | max prob dev {qat_dev:.6f}", flush=True)
    print(f"SUMMARY ptq_dev={ptq_dev:.4f} qat_dev={qat_dev:.6f} "
          f"ratio={ptq_dev / max(qat_dev, 1e-9):.1f}x", flush=True)


if __name__ == "__main__":
    main()
