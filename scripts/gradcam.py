#!/usr/bin/env python
"""Grad-CAM / attention-map visualization CLI.

Counterpart of the reference's interpretability pipeline
(``/root/reference/src/utils/gradcam.py:480-562``): loads a checkpoint,
picks images, computes per-disease Grad-CAMs (predicted prob > 0.5) and an
attention-rollout map per image, and saves overlay figures.

    python scripts/gradcam.py --config <yaml> --checkpoint <ckpt_dir> \
        [--dataset {nih,synthetic}] [--num-images 8] [--out <dir>]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("GAVIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

import gavit_tpu

gavit_tpu.setup_compilation_cache()

import numpy as np

from gavit_tpu.config import load_config
from gavit_tpu.data import ChestXrayDataset, SyntheticChestXrayDataset
from gavit_tpu.ops.preprocess import val_preprocess
from gavit_tpu.utils.visualization import VisualizationManager

logger = logging.getLogger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--dataset", choices=["nih", "synthetic"],
                        default="synthetic")
    parser.add_argument("--num-images", type=int, default=8)
    parser.add_argument("--out", type=str, default="")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config)
    out_dir = args.out or os.path.join(config.paths.save_dir, "gradcam")

    from scripts.evaluate import load_model

    model, params = load_model(args.checkpoint, config)

    d = config.data
    if args.dataset == "nih":
        ds = ChestXrayDataset(d.val_dir, d.val_labels, image_size=d.image_size)
    else:
        ds = SyntheticChestXrayDataset(
            size=max(args.num_images, 8), image_size=d.image_size
        )

    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=min(args.num_images, len(ds)), replace=False)
    images_u8 = np.stack([ds[i][0] for i in idx])
    targets = np.stack([ds[i][1] for i in idx])
    images = np.asarray(val_preprocess(images_u8))

    viz = VisualizationManager(out_dir, ds.disease_names)
    viz.plot_attention_maps(model, params, images, images_u8)
    logger.info("Wrote attention maps")

    # Grad-CAM per disease predicted above threshold anywhere in the batch
    logits = model.apply({"params": params}, images, deterministic=True)
    probs = np.asarray(jax.nn.sigmoid(logits))
    for c in range(len(ds.disease_names)):
        if (probs[:, c] > 0.5).any():
            viz.plot_gradcam(
                model, params, images, images_u8, c,
                filename=f"gradcam_{ds.disease_names[c]}.png",
            )
            logger.info(f"Wrote Grad-CAM for {ds.disease_names[c]}")

    viz.plot_prediction_grid(images_u8, targets, probs)
    logger.info(f"Artifacts in {out_dir}")


if __name__ == "__main__":
    main()
