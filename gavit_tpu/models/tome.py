"""Token merging (ToMe-style) accelerated inference.

ViT inference cost is linear-to-quadratic in the token count, and chest
X-ray patches are highly redundant (large homogeneous lung/background
fields). This module implements training-free token merging in the spirit
of ToMe (Bolya et al.; retrieved in PAPERS.md alongside the token-filter /
patch-cluster family): after every transformer block, the ``r`` most
similar (token-A, token-B) pairs under bipartite soft matching are merged
by size-weighted averaging, so block i runs on N − i·r tokens. Merging is
a pure accuracy/throughput dial at serving time — no retraining, no new
parameters — and every shape stays static (fixed ``r`` per block ⇒ XLA
compiles one graph).

Design choices vs the paper, for this stack:
  * merging applies AFTER each block (the reference Block is one fused
    unit here — attention kernels, fused MLP — and splitting it to merge
    mid-block would forfeit those kernels); the savings on all subsequent
    blocks dominate regardless.
  * token "sizes" are tracked and used for the weighted merge; proportional
    attention is not applied (the fused kernels have no bias input — the
    measured AUC cost of skipping it is part of the A/B below).
  * the cls token never merges; the graph branch must be ``dynamic`` (its
    kNN adjacency rebuilds from the CURRENT tokens; a learned-static
    [N, N] table has no meaning after merging) or disabled.

Exactness: ``r=0`` reproduces ``VisionTransformer.apply`` bit-for-bit on
the same param tree, and a model trained without merging keeps its
learnable-task AUC under moderate r (both pinned in ``tests/test_tome.py``);
the hardware throughput curve is measured by ``tools/r3_tome_tpu.py``
(BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from gavit_tpu.config import ModelConfig


def bipartite_merge(x, sizes, r: int, prec=None):
    """Merge the ``r`` most similar A→B token pairs (token 0 protected).

    Args:
      x: [B, N, C] tokens (token 0 = cls, never merged).
      sizes: [B, N, 1] how many original patches each token aggregates.
      r: number of merges (static; clamped to ⌊(N−1)/2⌋ − 1).
    Returns:
      (x', sizes') with N − r tokens. Token order is permuted — every
      consumer downstream (attention, kNN graph, mean-pools) is
      permutation-invariant.
    """
    n_tok = x.shape[1] - 1
    r = min(r, n_tok // 2 - 1)
    if r <= 0:
        return x, sizes
    cls_x, t = x[:, :1], x[:, 1:]
    cls_s, s = sizes[:, :1], sizes[:, 1:]
    a, b = t[:, 0::2], t[:, 1::2]
    sa, sb = s[:, 0::2], s[:, 1::2]

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    an = f32(a) / (jnp.linalg.norm(f32(a), axis=-1, keepdims=True) + 1e-6)
    bn = f32(b) / (jnp.linalg.norm(f32(b), axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum("bac,bkc->bak", an, bn,
                     precision=jax.lax.Precision.HIGHEST)
    best_val = jnp.max(sim, axis=-1)                 # [B, na]
    best_idx = jnp.argmax(sim, axis=-1)              # [B, na]

    order = jnp.argsort(-best_val, axis=-1)          # most similar first
    merge_i, keep_i = order[:, :r], order[:, r:]

    take = functools.partial(jnp.take_along_axis, axis=1)
    a_keep = take(a, keep_i[..., None])
    sa_keep = take(sa, keep_i[..., None])
    a_m = take(a, merge_i[..., None])                # [B, r, C]
    sa_m = take(sa, merge_i[..., None])              # [B, r, 1]
    dst = take(best_idx, merge_i)                    # [B, r]

    def scatter_one(bx, bs, d, ax, asz):
        num = bs * f32(bx)
        num = num.at[d].add(asz * f32(ax))
        den = bs.at[d].add(asz)
        return (num / den).astype(bx.dtype), den

    b_new, sb_new = jax.vmap(scatter_one)(b, sb, dst, a_m, sa_m)
    x_out = jnp.concatenate([cls_x, a_keep, b_new], axis=1)
    s_out = jnp.concatenate([cls_s, sa_keep, sb_new], axis=1)
    return x_out, s_out


def tome_forward(cfg: ModelConfig, params, images, r: int,
                 dtype=jnp.float32, attn_impl: str = "auto",
                 graph_impl: str = "auto", mlp_impl: str = "auto",
                 quant=None):
    """Deterministic forward with ``r`` tokens merged after every block.

    Reuses the trained param tree and the production Block/GraphBlock
    modules verbatim (same kernels); only the between-block merge is new.
    Returns fp32 logits.

    ``quant``: a calibrated static-int8 "quant" collection
    (``serving.calibrate_int8``/``export_quant``), threaded per submodule —
    the +32% int8 serving win composes with the token reduction. Per-tensor
    activation scales are token-count invariant and merged tokens are
    size-weighted averages of calibrated ones, so the calibration measured
    on the unmerged forward stays valid.
    """
    if cfg.graph.enabled and not cfg.graph.dynamic:
        raise ValueError(
            "token merging requires graph.dynamic=true (a learned-static "
            "[N, N] adjacency table has no meaning after merging) or "
            "graph.enabled=false"
        )
    if cfg.moe.enabled:
        raise ValueError(
            "token merging supports the dense trunk only (MoE expert "
            "capacity is sized to the unmerged token count); set "
            "model.moe.enabled=false or tome_r=0"
        )
    from gavit_tpu.models.layers import LN_EPS, Block, PatchEmbed, QDense
    from gavit_tpu.models.graph import GraphBlock

    q = "int8" if quant is not None else False

    def variables(name):
        v = {"params": params[name]}
        if quant is not None:
            v["quant"] = quant[name]
        return v

    b = images.shape[0]
    d = cfg.embed_dim
    x = PatchEmbed(
        patch_size=cfg.patch_size, embed_dim=d, dtype=dtype, quant=q,
    ).apply(variables("patch_embed"), images.astype(dtype))
    n = x.shape[1]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(dtype)
    sizes = jnp.ones((b, x.shape[1], 1), jnp.float32)

    graph_sites = set(cfg.graph_insert_after())
    g_idx = 0
    for i in range(cfg.depth):
        x = Block(
            dim=d, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, dtype=dtype, attn_impl=attn_impl,
            mlp_impl=mlp_impl, quant=q,
        ).apply(variables(f"blocks_{i}"), x, True)
        x, sizes = bipartite_merge(x, sizes, r)
        if i in graph_sites:
            x, _ = GraphBlock(
                dim=d, cfg=cfg.graph, num_patches=n, drop=0.0,
                dtype=dtype, impl=graph_impl, quant=q,
            ).apply(variables(f"graph_{g_idx}"), x, adj=None,
                    deterministic=True)
            g_idx += 1

    x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype).apply(
        {"params": params["norm"]}, x)
    logits = QDense(cfg.num_classes, dtype=dtype, quant=q).apply(
        variables("head"), x[:, 0].astype(dtype))
    return logits.astype(jnp.float32)


def tome_forward_fn(cfg: ModelConfig, r: int, dtype=jnp.float32, **kw):
    """A jittable ``fn(params, images) -> logits`` closure."""
    return functools.partial(tome_forward, cfg, r=r, dtype=dtype, **kw)
