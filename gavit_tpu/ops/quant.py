"""Int8 dynamic-quantized matmul for inference.

The v5e MXU runs int8×int8→int32 at 394 TOPS — 2× the bf16 peak — so a
post-training-quantized serving path can substantially outrun bf16 on
GEMM-dominated models. Scheme (standard dynamic PTQ):

  * activations: per-row absmax scales, computed on the fly (dynamic),
  * weights: per-column absmax scales (quantised from the fp32 params at
    call time; XLA hoists the weight quantisation out of the batch loop
    inside a jit when params are constant across calls),
  * accumulate int32 on the MXU, rescale fp32: y = (x̂ Ŵ) · (s_x ⊗ s_w).

Accuracy is use-at-your-own-risk as with any PTQ; the test suite pins the
logit deviation envelope vs the bf16 path, and serving exposes it as the
opt-in ``precision='int8'``.

**Measured result (v5e, ViT-B/16+graph2, BASELINE.md): dynamic int8 is
SLOWER than bf16 here** — 2,158 vs 2,500 img/s at b64, logit rel-dev 4.3% —
because the per-call absmax/round/cast passes are full HBM round-trips that
outweigh the MXU savings at this model size. Kept as opt-in infrastructure
for weight-only / static-scale variants (which remove the per-call
activation passes); bf16 remains the recommended serving precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rowwise(x, axis: int = -1):
    """int8 quantisation with absmax scales along ``axis``."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x, w):
    """x [..., K] fp, w [K, N] fp → [..., N] fp32 via int8 MXU dots.

    Per-row activation scales, per-column weight scales.
    """
    xq, sx = quantize_rowwise(x, axis=-1)           # [..., K], [..., 1]
    wq, sw = quantize_rowwise(w, axis=0)            # [K, N], [1, N]
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw
