"""PyTorch ↔ JAX weight conversion for the ViT backbone.

Converts checkpoints in the reference's state-dict layout
(``/root/reference/src/models/vit.py``) — including the MAE-pretrained
``vit-b_CXR_0.5M_mae.pth`` (``configs/baseline_config.yaml:23``) — into this
framework's Flax param tree, and back.

Layout rules:
  * ``nn.Linear`` weight [out, in]            → Dense kernel [in, out] (transpose)
  * ``patch_embed.proj`` Conv2d [D, C, p, p]  → patchify-GEMM kernel
    [C·p·p, D] via ``w.reshape(D, -1).T`` (the patch extractor orders
    features channel-major to make this exact — see models/layers.py)
  * ``LayerNorm.weight/bias``                 → ``scale`` / ``bias``
  * cls_token / pos_embed                     → same shapes

``load_mae_weights`` mirrors the reference's loader semantics
(``vit.py:182-200``): take ``checkpoint['model']``, drop every key containing
``head``, non-strict update of matching entries. Position embeddings are
bilinearly interpolated on grid-size mismatch (as the reference's robust
loader does, ``gradcam.py:457-464``), which also serves the 384px fine-tune
config.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32)


def torch_state_dict_to_params(state_dict: dict, depth: int) -> dict:
    """Reference-layout torch state dict → Flax param tree (model part)."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: dict = {}

    w = sd["patch_embed.proj.weight"]  # [D, C, p, p]
    params["patch_embed"] = {
        "proj": {
            "kernel": w.reshape(w.shape[0], -1).T,
            "bias": sd["patch_embed.proj.bias"],
        }
    }
    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "attn": {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")},
            "norm2": ln(f"{p}.norm2"),
            "mlp": {"fc1": dense(f"{p}.mlp.fc1"), "fc2": dense(f"{p}.mlp.fc2")},
        }

    params["norm"] = ln("norm")
    if "head.weight" in sd:
        params["head"] = dense("head")
    return jax.tree.map(jnp.asarray, params)


def params_to_torch_state_dict(params: dict) -> dict:
    """Flax param tree (model part) → reference-layout torch-style arrays."""
    p = jax.tree.map(np.asarray, params)
    sd: dict = {}
    k = p["patch_embed"]["proj"]["kernel"]  # [C*p*p, D]
    d = k.shape[1]
    # infer C, patch from pos_embed/grid is not needed: store flattened-conv form
    sd["patch_embed.proj.weight"] = k.T  # caller may reshape to [D,C,p,p]
    sd["patch_embed.proj.bias"] = p["patch_embed"]["proj"]["bias"]
    sd["cls_token"] = p["cls_token"]
    sd["pos_embed"] = p["pos_embed"]

    def put_dense(prefix, node):
        sd[f"{prefix}.weight"] = node["kernel"].T
        sd[f"{prefix}.bias"] = node["bias"]

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = node["scale"]
        sd[f"{prefix}.bias"] = node["bias"]

    i = 0
    while f"blocks_{i}" in p:
        b = p[f"blocks_{i}"]
        put_ln(f"blocks.{i}.norm1", b["norm1"])
        put_dense(f"blocks.{i}.attn.qkv", b["attn"]["qkv"])
        put_dense(f"blocks.{i}.attn.proj", b["attn"]["proj"])
        put_ln(f"blocks.{i}.norm2", b["norm2"])
        put_dense(f"blocks.{i}.mlp.fc1", b["mlp"]["fc1"])
        put_dense(f"blocks.{i}.mlp.fc2", b["mlp"]["fc2"])
        i += 1
    put_ln("norm", p["norm"])
    if "head" in p:
        put_dense("head", p["head"])
    del d
    return sd


def interpolate_pos_embed(pos_embed, target_num_patches: int):
    """Bilinearly resize the patch-grid part of a [1, N+1, D] pos embed."""
    pos_embed = jnp.asarray(pos_embed)
    n = pos_embed.shape[1] - 1
    if n == target_num_patches:
        return pos_embed
    d = pos_embed.shape[2]
    cls_pos, grid_pos = pos_embed[:, :1], pos_embed[:, 1:]
    old = int(round(float(np.sqrt(n))))
    new = int(round(float(np.sqrt(target_num_patches))))
    if old * old != n or new * new != target_num_patches:
        raise ValueError(f"non-square patch grids: {n} → {target_num_patches}")
    grid = grid_pos.reshape(1, old, old, d)
    grid = jax.image.resize(grid, (1, new, new, d), method="bilinear")
    return jnp.concatenate([cls_pos, grid.reshape(1, new * new, d)], axis=1)


def load_mae_weights(params: dict, checkpoint_path: str, depth: int) -> dict:
    """Non-strict MAE-pretrained init (reference ``vit.py:182-200``).

    Returns a new param tree with every matching non-head entry replaced by
    the pretrained value; the classification head keeps its fresh init.
    """
    import torch

    try:
        ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    except TypeError:  # older torch without weights_only
        ckpt = torch.load(checkpoint_path, map_location="cpu")
    state_dict = ckpt.get("model", ckpt)
    state_dict = {
        k: v.numpy() if hasattr(v, "numpy") else v
        for k, v in state_dict.items()
        if "head" not in k
    }
    converted = torch_state_dict_to_params(
        {**state_dict}, depth=depth
    ) if "patch_embed.proj.weight" in state_dict else {}

    def merge(dst, src, path=""):
        out = dict(dst)
        for key, val in src.items():
            if key not in dst:
                logger.info(f"MAE load: skipping unexpected {path}{key}")
                continue
            if isinstance(val, dict):
                out[key] = merge(dst[key], val, f"{path}{key}.")
            else:
                if dst[key].shape != val.shape:
                    if key == "pos_embed":
                        val = interpolate_pos_embed(val, dst[key].shape[1] - 1)
                        logger.info("MAE load: interpolated pos_embed")
                    else:
                        logger.warning(
                            f"MAE load: shape mismatch at {path}{key} "
                            f"{val.shape} vs {dst[key].shape}; skipping"
                        )
                        continue
                out[key] = jnp.asarray(val, dst[key].dtype)
        return out

    merged = merge(params, converted)
    logger.info(f"Loaded MAE pre-trained weights from {checkpoint_path}")
    return merged
