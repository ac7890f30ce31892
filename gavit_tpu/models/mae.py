"""Masked-autoencoder (MAE) pretraining for the ViT backbone.

The reference's training recipe STARTS from an MAE-pretrained checkpoint
(``/root/reference/configs/baseline_config.yaml:23`` →
``vit-b_CXR_0.5M_mae.pth``, loaded by ``src/models/vit.py:182-200``) that is
produced outside its repo — a user switching frameworks has no way to make
one. This module closes that gap: MAE pretraining (He et al., 2021) on
unlabeled images, TPU-first, whose encoder exports in the exact reference
``.pth`` layout that :func:`gavit_tpu.utils.torch_convert.load_mae_weights`
(and the reference's own loader) consumes.

TPU-first choices:
  * static shapes end-to-end — the mask count is fixed per config
    (``n_keep = round(N·(1−mask_ratio))``), so one XLA graph serves every
    step; masking is an argsort of external uniform noise (no boolean
    gather with data-dependent shape).
  * the encoder IS the production trunk: the same ``PatchEmbed``/``Block``
    modules with the same param names (``patch_embed``, ``cls_token``,
    ``pos_embed``, ``blocks_i``, ``norm``), so encoder params transfer by
    sub-tree and every fused kernel (attention v4, fused MLP) trains the
    MAE too.
  * per-patch pixel-norm targets (``norm_pix``) computed on device inside
    the loss — images ride to the device as uint8 like the supervised path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gavit_tpu.config import ModelConfig
from gavit_tpu.models.layers import LN_EPS, Block, PatchEmbed, QDense, trunc_init


def random_masking(x, noise, n_keep: int):
    """Shuffle-split masking (MAE §3.4): keep the ``n_keep`` tokens with the
    smallest noise, in noise order.

    Args:
      x: [B, N, D] tokens.  noise: [B, N] uniform.  n_keep: static.
    Returns:
      (x_vis [B, n_keep, D], mask [B, N] with 1 = masked,
       ids_restore [B, N]) — ``take_along_axis`` everywhere (MXU-friendly,
      no dynamic shapes).
    """
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :n_keep]
    x_vis = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
    mask = jnp.ones(noise.shape, x.dtype).at[:, :n_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_vis, mask, ids_restore


def patchify(images, patch_size: int):
    """[B, H, W, C] → [B, N, C·p·p] with the channel-major per-patch
    ordering :class:`PatchEmbed` uses (torch-conversion compatible)."""
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, gh * gw, c * p * p)


class MAEViT(nn.Module):
    """MAE = production encoder trunk + lightweight decoder.

    ``__call__(images, noise)`` returns ``(pred [B, N, C·p·p], mask [B, N])``;
    combine with :func:`mae_loss`. ``noise`` is external uniform [B, N] so
    the module is a pure function of its inputs (jit/donation friendly).
    """

    cfg: ModelConfig
    decoder_dim: int = 512
    decoder_depth: int = 4
    decoder_heads: int = 8
    mask_ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    mlp_impl: str = "auto"

    @nn.compact
    def __call__(self, images, noise):
        cfg = self.cfg
        d, p = cfg.embed_dim, cfg.patch_size
        b = images.shape[0]

        # ---- encoder (the production trunk, visible tokens only) --------
        x = PatchEmbed(patch_size=p, embed_dim=d, dtype=self.dtype,
                       name="patch_embed")(images.astype(self.dtype))
        n = x.shape[1]
        n_keep = max(1, int(round(n * (1.0 - self.mask_ratio))))
        pos_embed = self.param("pos_embed", trunc_init, (1, n + 1, d),
                               jnp.float32)
        cls_token = self.param("cls_token", trunc_init, (1, 1, d),
                               jnp.float32)
        x = x + pos_embed[:, 1:].astype(self.dtype)
        x_vis, mask, ids_restore = random_masking(x, noise, n_keep)
        cls = jnp.broadcast_to(
            (cls_token + pos_embed[:, :1]).astype(self.dtype), (b, 1, d))
        x = jnp.concatenate([cls, x_vis], axis=1)
        for i in range(cfg.depth):
            x = Block(dim=d, num_heads=cfg.num_heads,
                      mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                      dtype=self.dtype, attn_impl=self.attn_impl,
                      mlp_impl=self.mlp_impl, name=f"blocks_{i}")(x, True)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)

        # ---- decoder (discarded after pretraining) -----------------------
        dd = self.decoder_dim
        x = QDense(dd, dtype=self.dtype, name="decoder_embed")(x)
        mask_token = self.param("mask_token", trunc_init, (1, 1, dd),
                                jnp.float32)
        m = jnp.broadcast_to(mask_token.astype(self.dtype),
                             (b, n - n_keep, dd))
        full = jnp.concatenate([x[:, 1:], m], axis=1)        # no cls
        full = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
        full = jnp.concatenate([x[:, :1], full], axis=1)      # cls back
        dec_pos = self.param("decoder_pos_embed", trunc_init,
                             (1, n + 1, dd), jnp.float32)
        full = full + dec_pos.astype(self.dtype)
        for i in range(self.decoder_depth):
            full = Block(dim=dd, num_heads=self.decoder_heads,
                         mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                         dtype=self.dtype, attn_impl=self.attn_impl,
                         mlp_impl=self.mlp_impl,
                         name=f"decoder_blocks_{i}")(full, True)
        full = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="decoder_norm")(full)
        pred = QDense(cfg.in_chans * p * p, dtype=self.dtype,
                      name="decoder_pred")(full)[:, 1:]
        return pred.astype(jnp.float32), mask.astype(jnp.float32)


def mae_loss(pred, images_f32, mask, patch_size: int,
             norm_pix: bool = True):
    """MSE over MASKED patches only (fp32), per-patch-normalised targets."""
    target = patchify(images_f32, patch_size)
    if norm_pix:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean((pred - target) ** 2, axis=-1)  # [B, N]
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def encoder_params(mae_params: dict) -> dict:
    """The encoder sub-tree, named exactly like ``VisionTransformer``'s
    params (the decoder and mask token stay behind)."""
    keep = {"patch_embed", "cls_token", "pos_embed", "norm"}
    return {k: v for k, v in mae_params.items()
            if k in keep or k.startswith("blocks_")}


def export_reference_pth(mae_params: dict, path: str, *,
                         patch_size: int, in_chans: int = 3):
    """Write the encoder as a reference-layout ``.pth``: the artifact
    ``configs/baseline_config.yaml:23`` names — loadable by BOTH this
    framework (``model.pretrained_path`` / ``load_mae_weights``) and the
    reference's own ``vit.py:182-200`` loader."""
    import numpy as np
    import torch

    from gavit_tpu.utils.torch_convert import params_to_torch_state_dict

    sd = params_to_torch_state_dict(encoder_params(mae_params))
    w = sd["patch_embed.proj.weight"]  # [D, C·p·p] → conv [D, C, p, p]
    sd["patch_embed.proj.weight"] = w.reshape(
        w.shape[0], in_chans, patch_size, patch_size)
    torch.save(
        {"model": {k: torch.from_numpy(np.array(v, copy=True))
                   for k, v in sd.items()}},
        path,
    )
