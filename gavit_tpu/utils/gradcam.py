"""Grad-CAM and attention-map extraction for the ViT (JAX-native).

Functional re-design of the reference's hook-based implementation
(``/root/reference/src/utils/gradcam.py:225-300``): where PyTorch registers
forward/backward hooks on ``blocks.11.attn`` (``gradcam.py:233-236``), JAX
exposes the intermediate token activations through the model's
``capture='tokens'`` output and differentiates w.r.t. them with ``jax.vjp``.

CAM recipe matches the reference (``gradcam.py:290-300``): per target class,
 weights = mean over patch tokens of ∂logit/∂tokens, CAM = ReLU(Σ_d w_d ·
 token_d) over the last block's patch tokens, reshaped to the patch grid and
min-max normalised. Multi-disease overlays weight each CAM by its predicted
probability when > 0.5 (``gradcam.py:365-379``).
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class VisionTransformerGradCAM:
    """Grad-CAM over the last transformer block's patch tokens.

    Args:
      model: a VisionTransformer (Flax module supporting capture='tokens').
      params: its parameter tree.
      block_index: which block's tokens to use (-1 = last, the reference
        hooks blocks.11 — ``gradcam.py:226``).
    """

    def __init__(self, model, params, block_index: int = -1):
        self.model = model
        self.params = params
        self.block_index = block_index
        self._jit_cache: dict = {}

    def _grad_tokens(self, images, class_idx: int):
        """∂ logits[:, class_idx] / ∂ tokens_at_block + the activations.

        A zero-valued probe tensor is added to the chosen block's output
        inside the forward pass (the functional analogue of the reference's
        backward hook); its gradient IS the gradient w.r.t. those tokens.
        """
        model, bi = self.model, self.block_index

        key = class_idx
        if key not in self._jit_cache:

            # params ride as a jit argument — a closure would bake them in
            # as program constants (rejected by tunneled remote-compile
            # backends for ViT-B-sized trees; see CLAUDE.md)
            @jax.jit
            def run(params, images):
                probe = jnp.zeros(
                    (images.shape[0],) + self._token_shape(images), jnp.float32
                )

                def with_probe(probe):
                    logits, toks = model.apply(
                        {"params": params}, images, deterministic=True,
                        capture="tokens", token_probe=(bi, probe),
                    )
                    return jnp.sum(logits[:, class_idx]), (logits, toks)

                grads, (logits, toks) = jax.grad(with_probe, has_aux=True)(probe)
                return logits, toks, grads

            self._jit_cache[key] = run
        return self._jit_cache[key](self.params, images)

    def _token_shape(self, images):
        cfg = self.model.cfg
        n = (images.shape[1] // cfg.patch_size) * (images.shape[2] // cfg.patch_size)
        return (n + 1, cfg.embed_dim)

    def __call__(self, images, class_idx: int):
        """Compute CAMs: images [B, H, W, 3] (normalised) → [B, gh, gw]."""
        logits, toks, grads = self._grad_tokens(images, class_idx)
        tokens = np.asarray(toks[self.block_index], np.float32)[:, 1:]  # drop CLS
        g = np.asarray(grads, np.float32)[:, 1:]
        weights = g.mean(axis=1, keepdims=True)  # [B, 1, D]
        cam = np.maximum((weights * tokens).sum(-1), 0.0)  # [B, N]
        n = cam.shape[-1]
        side = int(math.isqrt(n))
        cam = cam.reshape(-1, side, side)
        lo = cam.min(axis=(1, 2), keepdims=True)
        hi = cam.max(axis=(1, 2), keepdims=True)
        cam = (cam - lo) / np.maximum(hi - lo, 1e-8)
        return cam, np.asarray(jax.nn.sigmoid(logits))


def attention_rollout(model, params, images, head_fusion: str = "mean"):
    """Attention-rollout maps from the captured per-block attention
    (alternative interpretability view; reference extracts per-block
    attention maps at ``gradcam.py:244-260``)."""
    logits, attns = model.apply(
        {"params": params}, images, deterministic=True, capture="attention"
    )
    result = None
    for a in attns:  # each [B, H, N, N]
        a = np.asarray(a, np.float32)
        if head_fusion == "max":
            fused = a.max(axis=1)
        else:
            fused = a.mean(axis=1)
        n = fused.shape[-1]
        fused = fused + np.eye(n)  # residual connection
        fused = fused / fused.sum(-1, keepdims=True)
        result = fused if result is None else np.einsum(
            "bij,bjk->bik", fused, result
        )
    # CLS row attention over patch tokens
    maps = result[:, 0, 1:]
    side = int(math.isqrt(maps.shape[-1]))
    maps = maps.reshape(-1, side, side)
    lo = maps.min(axis=(1, 2), keepdims=True)
    hi = maps.max(axis=(1, 2), keepdims=True)
    return (maps - lo) / np.maximum(hi - lo, 1e-8), np.asarray(logits)


def load_bbox_annotations(csv_path: str, min_boxes: int = 1,
                          max_boxes: int | None = None) -> dict:
    """Parse an NIH BBox-list CSV into {image_name: {bboxes, labels}}.

    Counterpart of the reference's ground-truth box reader
    (``/root/reference/src/utils/gradcam.py:417-439``): rows carry an image
    name, a finding label and (x, y, w, h); images are filtered by their box
    count. Column names are matched loosely (NIH ships ``Bbox [x`` etc.).
    Boxes are returned as (x0, y0, x1, y1) in source-image coordinates.
    """
    import csv

    def find_col(header, *cands):
        for cand in cands:
            for i, name in enumerate(header):
                if cand.lower() in name.lower():
                    return i
        raise ValueError(f"none of {cands} found in CSV header {header}")

    records: dict = {}
    with open(csv_path) as f:
        reader = csv.reader(f)
        header = next(reader)
        i_img = find_col(header, "image index", "image")
        i_lab = find_col(header, "finding label", "label")
        i_x = find_col(header, "bbox_x", "bbox [x", "x")
        i_y = find_col(header, "bbox_y", "y")
        i_w = find_col(header, "bbox_w", "w")
        i_h = find_col(header, "bbox_h", "h")
        for row in reader:
            if not row or len(row) <= i_h:
                continue
            name = row[i_img]
            x, y = float(row[i_x]), float(row[i_y])
            w, h = float(row[i_w]), float(row[i_h])
            rec = records.setdefault(name, {"bboxes": [], "labels": []})
            rec["bboxes"].append((x, y, x + w, y + h))
            rec["labels"].append(row[i_lab])

    out = {}
    for name, rec in records.items():
        n = len(rec["bboxes"])
        if n < min_boxes:
            continue
        if max_boxes is not None and n > max_boxes:
            continue
        out[name] = rec
    return out


def draw_bboxes(ax, bboxes, labels, scale: float = 1.0,
                color: str = "lime"):
    """Draw ground-truth boxes (source coordinates × scale) on an axis."""
    import matplotlib.patches as patches

    for (x0, y0, x1, y1), label in zip(bboxes, labels):
        ax.add_patch(patches.Rectangle(
            (x0 * scale, y0 * scale), (x1 - x0) * scale, (y1 - y0) * scale,
            linewidth=1.5, edgecolor=color, facecolor="none",
        ))
        ax.text(x0 * scale, max(y0 * scale - 3, 0), label, fontsize=7,
                color=color)


def overlay_cam(image_u8: np.ndarray, cam: np.ndarray, alpha: float = 0.5):
    """Resize a CAM to the image and blend as a jet heatmap (host-side)."""
    import matplotlib.cm as cm
    from PIL import Image

    h, w = image_u8.shape[:2]
    cam_img = Image.fromarray((cam * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR
    )
    heat = cm.jet(np.asarray(cam_img, np.float32) / 255.0)[..., :3]
    base = image_u8.astype(np.float32) / 255.0
    out = (1 - alpha) * base + alpha * heat
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
