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


def analysis_figure(image_u8, cams_by_disease, probs_row, disease_names,
                    bboxes, labels, bbox_scale, save_path):
    """Per-image analysis: original + GT boxes, prob-weighted combined CAM,
    per-disease CAMs — the reference's multi-disease overlay weighted by
    predicted probability > 0.5 (``gradcam.py:365-379``) with ground-truth
    boxes (``gradcam.py:417-439``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gavit_tpu.utils.gradcam import draw_bboxes, overlay_cam

    predicted = [(c, probs_row[c]) for c in cams_by_disease]
    n_panels = 2 + len(predicted)
    fig, axes = plt.subplots(1, n_panels, figsize=(3.2 * n_panels, 3.6))
    axes = list(axes) if n_panels > 1 else [axes]

    axes[0].imshow(image_u8)
    draw_bboxes(axes[0], bboxes, labels, scale=bbox_scale)
    axes[0].set_title("ground truth")
    axes[0].axis("off")

    if predicted:
        total_p = sum(p for _, p in predicted)
        combined = sum(
            p * cams_by_disease[c] for c, p in predicted
        ) / max(total_p, 1e-8)
        axes[1].imshow(overlay_cam(image_u8, combined))
        draw_bboxes(axes[1], bboxes, labels, scale=bbox_scale, color="white")
    else:
        axes[1].imshow(image_u8)
    axes[1].set_title("combined CAM (prob-weighted)")
    axes[1].axis("off")

    for ax, (c, p) in zip(axes[2:], predicted):
        ax.imshow(overlay_cam(image_u8, cams_by_disease[c]))
        ax.set_title(f"{disease_names[c]} (p={p:.2f})")
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--dataset", choices=["nih", "synthetic"],
                        default="synthetic")
    parser.add_argument("--num-images", type=int, default=8)
    parser.add_argument("--out", type=str, default="")
    parser.add_argument("--bbox-csv", type=str, default="",
                        help="NIH BBox-list CSV: draw ground-truth boxes and "
                             "per-disease CAM analysis figures")
    parser.add_argument("--bbox-source-size", type=int, default=1024,
                        help="resolution the bbox coordinates refer to")
    parser.add_argument("--set", action="append", default=[],
                        dest="overrides", metavar="KEY=VALUE",
                        help="Override a config value (dotted keys, "
                             "YAML-parsed values)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config, args.overrides)
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
    annotations = {}
    if args.bbox_csv:
        from gavit_tpu.utils.gradcam import load_bbox_annotations

        annotations = load_bbox_annotations(args.bbox_csv, min_boxes=2,
                                            max_boxes=3)
        name_to_idx = {str(p): i for i, p in enumerate(ds.image_paths)}
        annotated = [n for n in annotations if n in name_to_idx]
        rng.shuffle(annotated)
        idx = np.asarray(
            [name_to_idx[n] for n in annotated[: args.num_images]], int
        )
        if len(idx) == 0:
            logger.warning("no annotated images found in the dataset")
    if not args.bbox_csv or len(idx) == 0:
        idx = rng.choice(len(ds), size=min(args.num_images, len(ds)),
                         replace=False)
    images_u8 = np.stack([ds[i][0] for i in idx])
    targets = np.stack([ds[i][1] for i in idx])
    images = np.asarray(val_preprocess(images_u8))

    viz = VisualizationManager(out_dir, ds.disease_names)
    viz.plot_attention_maps(model, params, images, images_u8)
    # per-layer raw heatmaps (reference visualization.py:98-130) for the
    # first selected image; the rollout above is the aggregate view
    viz.plot_per_layer_attention(model, params, images[:1])
    logger.info("Wrote attention maps (rollout + per-layer)")

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

    if annotations:
        from gavit_tpu.utils.gradcam import VisionTransformerGradCAM

        gc = VisionTransformerGradCAM(model, params)
        scale = d.image_size / args.bbox_source_size
        for j, i in enumerate(idx):
            name = str(ds.image_paths[i])
            if name not in annotations:
                continue
            pred_classes = [c for c in range(len(ds.disease_names))
                            if probs[j, c] > 0.5]
            cams = {}
            for c in pred_classes:
                cam_batch, _ = gc(images[j:j + 1], c)
                cams[c] = cam_batch[0]
            ann = annotations[name]
            analysis_figure(
                images_u8[j], cams, probs[j], ds.disease_names,
                ann["bboxes"], ann["labels"], scale,
                os.path.join(
                    out_dir, f"analysis_{os.path.splitext(name)[0]}.png"
                ),
            )
            logger.info(f"Wrote analysis figure for {name}")

    logger.info(f"Artifacts in {out_dir}")


if __name__ == "__main__":
    main()
