"""Graph-augmented Vision Transformer (Flax), TPU-first.

Forward path mirrors the reference model's semantics
(``/root/reference/src/models/vit.py:122-224``): patchify → +CLS → +learned
position embeddings → pos-dropout → transformer blocks (pre-LN, stochastic
depth linearly spaced over depth, ``vit.py:144``) → final LayerNorm → CLS
token → linear head to ``num_classes`` logits — with the graph
message-passing blocks (new capability) interleaved at configurable depths.

TPU-first choices: NHWC images, patchify as reshape+GEMM, fused Pallas
attention, bf16 compute with fp32 params and fp32 LayerNorm/softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gavit_tpu.config import ModelConfig
from gavit_tpu.models.graph import GraphBlock
from gavit_tpu.models.layers import (
    LN_EPS,
    Block,
    FusedDropout,
    PatchEmbed,
    QDense,
)


class VisionTransformer(nn.Module):
    """ViT backbone + optional interleaved graph blocks.

    Call with images [B, H, W, C] (NHWC, already normalised); returns
    [B, num_classes] logits. ``capture='tokens'`` additionally returns the
    per-block token activations (used by Grad-CAM / attention visualisation).
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    graph_impl: str = "auto"
    mlp_impl: str = "auto"
    # 'int8': int8-quantised GEMMs (serving PTQ; 2x MXU peak on v5e);
    # 'qat': fake-quantised GEMMs for quantisation-aware training
    quant: bool | str = False
    # sequence parallelism under TP (config mesh.sp): token-shard the
    # residual stream through the elementwise segments
    sp: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        capture: str | None = None,
        token_probe: tuple | None = None,
    ):
        """Forward pass.

        Args:
          capture: None | 'tokens' (per-block token activations) |
            'attention' (per-block [B,H,N,N] attention probabilities — uses
            the reference attention path since the fused kernel never
            materialises them).
          token_probe: (block_index, probe_array) — the probe is ADDED to
            that block's output; differentiating w.r.t. it yields gradients
            w.r.t. the tokens (the functional analogue of a backward hook,
            used by Grad-CAM).
        """
        cfg = self.cfg
        b = x.shape[0]
        d = cfg.embed_dim

        x = PatchEmbed(
            patch_size=cfg.patch_size, embed_dim=d, dtype=self.dtype,
            quant=self.quant, name="patch_embed",
        )(x.astype(self.dtype))
        n = x.shape[1]

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d),
            jnp.float32,
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, n + 1, d),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(self.dtype)
        x = FusedDropout(cfg.drop_rate)(x, deterministic=deterministic)
        if self.sp:
            from gavit_tpu.parallel.op_sharding import seq_shard_constraint

            x = seq_shard_constraint(x)

        graph_sites = set(cfg.graph_insert_after())
        moe_sites = set(cfg.moe_sites())
        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1) for i in range(cfg.depth)
        ]

        probe_index = None
        if token_probe is not None:
            probe_index = token_probe[0] % cfg.depth

        captured = []
        adj = None
        g_idx = 0
        # remat: recompute each block in the backward instead of storing its
        # activations (static_argnums: deterministic/return_probs are
        # Python bools; self is argnum 0)
        BlockCls = (
            nn.remat(Block, static_argnums=(2, 3)) if cfg.remat else Block
        )
        for i in range(cfg.depth):
            x = BlockCls(
                dim=d, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate, drop_path_rate=dpr[i],
                dtype=self.dtype, attn_impl=self.attn_impl,
                mlp_impl=self.mlp_impl, sp=self.sp,
                moe=cfg.moe if i in moe_sites else None,
                quant=self.quant, name=f"blocks_{i}",
            )(x, deterministic, capture == "attention")
            if capture == "attention":
                x, probs = x
                captured.append(probs)
            if probe_index is not None and i == probe_index:
                x = x + token_probe[1].astype(x.dtype)
            if capture == "tokens":
                captured.append(x)
            if i in graph_sites:
                x, new_adj = GraphBlock(
                    dim=d, cfg=cfg.graph, num_patches=n, drop=cfg.drop_rate,
                    dtype=self.dtype, impl=self.graph_impl,
                    quant=self.quant, name=f"graph_{g_idx}",
                )(x, adj=adj if not cfg.graph.dynamic else None,
                  deterministic=deterministic)
                if not cfg.graph.dynamic and adj is None:
                    adj = new_adj
                g_idx += 1

        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        feats = x.astype(self.dtype)
        cls_out = feats[:, 0]
        logits = QDense(
            cfg.num_classes, dtype=self.dtype, quant=self.quant, name="head"
        )(cls_out)
        logits = logits.astype(jnp.float32)

        if capture in ("tokens", "attention"):
            return logits, captured
        return logits


def build_model(cfg: ModelConfig, *, precision: str = "fp32",
                attn_impl: str = "auto", graph_impl: str = "auto",
                mlp_impl: str = "auto", sp: bool = False,
                qat: bool = False):
    """precision: 'fp32' (parity eval) | 'bf16' (training/serving) |
    'int8' (PTQ serving: int8 GEMMs, bf16 elsewhere). ``sp``: sequence
    parallelism under a >1 'model' mesh axis (config ``mesh.sp``).
    ``qat``: quantisation-aware training — every GEMM the int8 serving
    path quantises is fake-quantised against the same static scales, so
    the trained checkpoint serves int8 with (near) zero deviation."""
    dtype = jnp.float32 if precision == "fp32" else jnp.bfloat16
    quant = "int8" if precision == "int8" else ("qat" if qat else False)
    return VisionTransformer(
        cfg=cfg, dtype=dtype, attn_impl=attn_impl, graph_impl=graph_impl,
        mlp_impl=mlp_impl, quant=quant, sp=sp,
    )


def init_params(model: VisionTransformer, rng, img_size: int | None = None):
    """Initialise parameters with a dummy batch (fp32 params)."""
    cfg = model.cfg
    size = img_size or cfg.img_size
    dummy = jnp.zeros((1, size, size, cfg.in_chans), jnp.float32)
    variables = model.init({"params": rng}, dummy, deterministic=True)
    return variables["params"]


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
