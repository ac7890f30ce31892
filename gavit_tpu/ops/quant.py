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

**Measured results (v5e, ViT-B/16+graph2, BASELINE.md)**: dynamic int8 is
SLOWER than bf16 (2,158 vs ~2,500 img/s at b64 — the per-call absmax/round/
cast passes are full HBM round-trips), but **static-scale int8
(:func:`static_int8_matmul` with weights pre-quantised offline and
activation scales calibrated via ``gavit_tpu.serving.calibrate_int8``) WINS:
2,850 vs 2,572 img/s at b64 (+10.8%), max prob deviation 0.019**. The
dynamic path remains only as the calibration-run fallback.
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


def quantize_activation_static(x, act_scale):
    """int8 quantisation with a pre-calibrated per-tensor scale: one fused
    mul/round/clip pass (no absmax reduction — the pass that made dynamic
    PTQ lose on HBM traffic, BASELINE.md)."""
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)
    return q


def static_int8_matmul(x, w_q, w_scale, act_scale):
    """x [..., K] fp × pre-quantised w_q int8 [K, N] → [..., N] fp32.

    Weights are quantised ONCE offline (per-column scales); activations use a
    static per-tensor scale calibrated from sample batches
    (``gavit_tpu.serving.calibrate_int8``).
    """
    xq = quantize_activation_static(x, act_scale)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (act_scale * w_scale)


def fake_quant_act(x, act_scale):
    """Quantise-dequantise ``x`` with a fixed per-tensor scale (QAT).

    Forward is EXACTLY the value the int8 serving path reconstructs for the
    activation operand (``quantize_activation_static`` → ·scale), so a
    model trained through this op sees the same quantisation noise it will
    serve under. Backward is the clipped straight-through estimator:
    identity inside the representable range [-127·s, 127·s], zero outside
    (the standard QAT rule — out-of-range values are saturated, so their
    local gradient is genuinely zero).
    """
    return _fq_act(x, act_scale)


@jax.custom_vjp
def _fq_act(x, act_scale):
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale), -127, 127)
    return (q * act_scale).astype(x.dtype)


def _fq_act_fwd(x, act_scale):
    in_range = jnp.abs(x.astype(jnp.float32)) <= 127.0 * act_scale
    return _fq_act(x, act_scale), in_range


def _fq_act_bwd(in_range, g):
    return jnp.where(in_range, g, 0.0).astype(g.dtype), None


_fq_act.defvjp(_fq_act_fwd, _fq_act_bwd)


def fake_quant_weight(w):
    """Quantise-dequantise ``w`` with per-column absmax scales (QAT).

    The scale tracks the live weight every call (weights move during
    training), exactly as the serving export (`quantize_rowwise`) will
    quantise the final checkpoint. Absmax scaling never clips, so the
    straight-through estimator is the plain identity.
    """
    return _fq_w(w)


@jax.custom_vjp
def _fq_w(w):
    q, scale = quantize_rowwise(w, axis=0)
    return (q.astype(jnp.float32) * scale).astype(w.dtype)


def _fq_w_fwd(w):
    return _fq_w(w), None


def _fq_w_bwd(_, g):
    return (g,)


_fq_w.defvjp(_fq_w_fwd, _fq_w_bwd)


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
