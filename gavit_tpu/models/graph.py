"""Graph message-passing block, interleaved with transformer blocks.

Realises the graph branch the reference repo names but never implemented
(see SURVEY.md §0.1): patch-token adjacency via pairwise cosine similarity
(kNN / threshold / dense / learned-static) and adjacency-weighted message
passing with a residual connection.

Design:
  * Pre-LN like the transformer blocks: similarity and values are computed
    from LayerNorm'd tokens.
  * ``A @ (LN(t) W_v)`` aggregation followed by an output projection.
  * A learnable scalar gate, initialised to 0, scales the graph message into
    the residual stream — at init a graph-augmented model is logit-identical
    to the plain ViT, so MAE-pretrained weights (and the parity bar vs the
    PyTorch reference) are preserved exactly, and the graph branch grows in
    during training (LayerScale-style).
  * The CLS token bypasses the graph (configurable via ``include_cls``).
  * On TPU the similarity→sparsify→softmax→aggregate chain runs as one fused
    Pallas kernel (:func:`gavit_tpu.ops.graph_ops.fused_graph_aggregate`);
    when an adjacency must be shared across blocks (``dynamic: false``) or is
    a learned parameter, the XLA path materialises it once and reuses it.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gavit_tpu.config import GraphConfig
from gavit_tpu.models.layers import LN_EPS, FusedDropout, QDense
from gavit_tpu.ops.graph_ops import (
    build_adjacency,
    fused_graph_aggregate,
    graph_aggregate,
)


class GraphBlock(nn.Module):
    dim: int
    cfg: GraphConfig
    num_patches: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # 'auto' → fused pallas kernel whenever adjacency is built in-block;
    # 'reference' → always the XLA einsum path
    impl: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, x, adj=None, deterministic: bool = True):
        """Apply graph message passing.

        Args:
          x: [B, N+1, D] tokens, CLS at index 0.
          adj: optional precomputed row-stochastic adjacency to reuse
            (static-adjacency mode with multiple graph blocks).

        Returns:
          (tokens [B, N+1, D], adjacency used — for reuse by later blocks,
           or None when it stayed fused inside the kernel).
        """
        g = self.cfg
        if g.include_cls:
            t = x
        else:
            t = x[:, 1:]

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(t)
        h = h.astype(self.dtype)
        values = QDense(
            self.dim, dtype=self.dtype, quant=self.quant, name="value"
        )(h, fuse_bias_grad=not deterministic)

        adj_out = adj
        if g.adjacency == "learned_static":
            n = t.shape[1]
            logits = self.param(
                "adj_logits", nn.initializers.zeros_init(), (n, n), jnp.float32
            )
            adj_used = nn.softmax(logits / g.temperature, axis=-1)
            msg = graph_aggregate(adj_used[None], values)
            adj_out = None  # parameter-backed; nothing to thread through
        elif adj is not None:
            msg = graph_aggregate(adj, values)
        elif self.impl == "reference" or not g.dynamic:
            # materialise the adjacency (needed for reuse across blocks)
            adj_used = build_adjacency(
                h, mode=g.adjacency, k=g.k,
                threshold=g.threshold, temperature=g.temperature,
            )
            msg = graph_aggregate(adj_used, values)
            adj_out = adj_used
        else:
            msg = fused_graph_aggregate(
                h, values, g.adjacency, g.k, g.threshold, g.temperature
            )

        msg = QDense(
            self.dim, dtype=self.dtype, quant=self.quant, name="proj"
        )(msg, fuse_bias_grad=not deterministic)
        msg = FusedDropout(self.drop)(msg, deterministic=deterministic)

        gate = self.param("gate", nn.initializers.zeros_init(), (), jnp.float32)
        t = t + gate.astype(t.dtype) * msg

        if g.include_cls:
            out = t
        else:
            out = jnp.concatenate([x[:, :1], t], axis=1)
        return out, adj_out
