#!/usr/bin/env python
"""A/B: post-training quantisation vs quantisation-aware training.

Trains the SAME tiny model on the learnable synthetic task twice — plain
and with ``training.qat`` — then serves both checkpoints int8 and measures
(a) the int8-vs-fp32 probability deviation per run and (b) val AUC under
each serving mode. The claim under test: QAT closes the train/serve skew
that PTQ pays (BASELINE.md r2: 0.017–0.019 max prob deviation at ViT-B).

CPU-runnable (tiny shapes): GAVIT_PLATFORM=cpu python tools/r4_qat_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.serving import calibrate_int8, export_quant
    from gavit_tpu.training import Trainer
    from gavit_tpu.utils.metrics import MetricCalculator

    img, depth, embed = 32, 2, 64
    epochs = int(os.environ.get("QAT_AB_EPOCHS", "8"))

    def make_cfg(qat: bool, save_dir: str):
        return from_dict({
            "model": {"name": "custom", "img_size": img, "patch_size": 8,
                      "embed_dim": embed, "depth": depth, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.1,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 4}},
            "data": {"batch_size": 32, "image_size": img},
            "training": {"epochs": epochs, "warmup_epochs": 1,
                         "precision": "fp32", "qat": qat,
                         "learning_rate": 3e-4, "log_every": 100},
            "paths": {"save_dir": save_dir, "log_dir": save_dir + "/logs"},
        })

    tr_ds = SyntheticChestXrayDataset(size=256, image_size=img, seed=0,
                                      learnable=True)
    va_ds = SyntheticChestXrayDataset(size=128, image_size=img, seed=1,
                                      learnable=True)
    val_imgs = np.stack([np.asarray(va_ds[i][0]) for i in range(128)])
    val_labels = np.stack([np.asarray(va_ds[i][1]) for i in range(128)])
    mc = MetricCalculator(va_ds.disease_names)

    def run(qat: bool):
        tag = "qat" if qat else "plain"
        cfg = make_cfg(qat, f"/tmp/qat_ab/{tag}")
        model = build_model(cfg.model, precision="fp32")
        params = init_params(model, jax.random.key(0))
        tl = DataLoader(tr_ds, 32, shuffle=True, num_workers=1)
        vl = DataLoader(va_ds, 32, num_workers=1)
        trainer = Trainer(model, params, tl, vl, cfg)
        res = trainer.train()
        print(f"[{tag}] trained: best val AUC {res['best_val_auc']:.4f}",
              flush=True)
        return trainer

    def auc_of(probs):
        m = mc.calculate_metrics(val_labels, np.asarray(probs))
        return m["mean_auc"]

    from gavit_tpu.ops.preprocess import val_preprocess

    x_val = val_preprocess(jnp.asarray(val_imgs, jnp.uint8))

    # --- plain + PTQ -------------------------------------------------------
    t = run(qat=False)
    params = jax.device_get(t.state.params["model"])
    fp_model = t.model
    fp_probs = jax.nn.sigmoid(fp_model.apply(
        {"params": params}, x_val, deterministic=True))
    int8_model = build_model(t.config.model, precision="int8")
    int8_model = int8_model.clone(dtype=jnp.float32)  # isolate quant noise
    quant = calibrate_int8(int8_model, params, x_val[:32])
    ptq_probs = jax.nn.sigmoid(int8_model.apply(
        {"params": params, **quant}, x_val, deterministic=True))
    ptq_dev = float(jnp.max(jnp.abs(ptq_probs - fp_probs)))
    print(f"[plain] fp32 AUC {auc_of(fp_probs):.4f} | int8-PTQ AUC "
          f"{auc_of(ptq_probs):.4f} | max prob dev {ptq_dev:.4f}",
          flush=True)

    # --- QAT ----------------------------------------------------------------
    t = run(qat=True)
    params = jax.device_get(t.state.params["model"])
    scales = jax.device_get(t._quant)
    qat_fp_probs = jax.nn.sigmoid(t.model.apply(
        {"params": params, **scales}, x_val, deterministic=True))
    int8_model = t.model.clone(quant="int8")
    quant = export_quant(params, scales)
    qat_int8_probs = jax.nn.sigmoid(int8_model.apply(
        {"params": params, **quant}, x_val, deterministic=True))
    qat_dev = float(jnp.max(jnp.abs(qat_int8_probs - qat_fp_probs)))
    print(f"[qat]   fp32(fake-quant) AUC {auc_of(qat_fp_probs):.4f} | "
          f"int8 AUC {auc_of(qat_int8_probs):.4f} | max prob dev "
          f"{qat_dev:.6f}", flush=True)
    print(f"SUMMARY ptq_dev={ptq_dev:.4f} qat_dev={qat_dev:.6f} "
          f"ratio={ptq_dev / max(qat_dev, 1e-9):.1f}x", flush=True)


if __name__ == "__main__":
    main()
