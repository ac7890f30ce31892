"""Dynamic weighted multi-label loss (JAX).

Same math as the reference criterion
(``/root/reference/src/training/losses.py:7-68``): a softmax-normalised
*learnable* 3-way combination of

  * weighted BCE-with-logits (per-class pos_weight = neg/pos counts),
  * focal loss (γ = 2), and
  * asymmetric loss (γ⁺ = 1, γ⁻ = 4, probability clamp 1e-8),

where the three λ parameters are trained jointly with the model (at 0.1× the
model learning rate, reference ``trainer.py:47-56``). Functional style: the
λ parameters live in a small params pytree alongside the model params rather
than in an nn.Module, so the whole loss is a pure jittable function.

All terms are computed in fp32 regardless of the activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FOCAL_GAMMA = 2.0
ASL_GAMMA_POS = 1.0
ASL_GAMMA_NEG = 4.0
ASL_CLIP = 1e-8


def init_criterion_params(num_classes: int | None = None):
    """λ parameters, initialised to 1.0 each (reference ``losses.py:14-16``)."""
    del num_classes
    return {
        "lambda_wbce": jnp.float32(1.0),
        "lambda_focal": jnp.float32(1.0),
        "lambda_asl": jnp.float32(1.0),
    }


def _stack_lambdas(cp):
    return jnp.stack([cp["lambda_wbce"], cp["lambda_focal"], cp["lambda_asl"]])


def get_loss_weights(criterion_params):
    """Softmax-normalised loss weights (reference ``losses.py:70-76``)."""
    return jax.nn.softmax(_stack_lambdas(criterion_params))


def bce_with_logits(logits, targets, pos_weight=None):
    """Numerically stable per-element BCE-with-logits.

    With ``pos_weight`` p:  p·t·softplus(-x) + (1-t)·(x + softplus(-x)).
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    sp_neg = jax.nn.softplus(-x)  # = -log sigmoid(x)
    pos_term = t * sp_neg
    if pos_weight is not None:
        pos_term = pos_term * pos_weight.astype(jnp.float32)
    neg_term = (1.0 - t) * (x + sp_neg)  # = -(1-t)·log(1-sigmoid(x))
    return pos_term + neg_term


def dynamic_weighted_loss(criterion_params, logits, targets, pos_weight=None,
                          *, per_example: bool = False):
    """Returns (total_loss, {'wbce','focal','asl'}) — reference
    ``losses.py:26-68``.

    With ``per_example=True`` all values are [B] vectors (mean over the class
    axis only); the batch mean of those vectors equals the scalar form, and
    callers with wrap-padded tail batches can mask pad rows exactly.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    w = get_loss_weights(criterion_params)
    axis = -1 if per_example else None

    wbce = jnp.mean(bce_with_logits(x, t, pos_weight), axis=axis)

    bce = bce_with_logits(x, t)
    pt = jnp.exp(-bce)
    focal = jnp.mean((1.0 - pt) ** FOCAL_GAMMA * bce, axis=axis)

    xs_pos = jax.nn.sigmoid(x)
    xs_neg = 1.0 - xs_pos
    los_pos = t * jnp.log(jnp.clip(xs_pos, min=ASL_CLIP)) * (
        (1.0 - xs_pos) ** ASL_GAMMA_POS
    )
    los_neg = (1.0 - t) * jnp.log(jnp.clip(xs_neg, min=ASL_CLIP)) * (
        xs_pos ** ASL_GAMMA_NEG
    )
    asl = -jnp.mean(los_pos + los_neg, axis=axis)

    total = w[0] * wbce + w[1] * focal + w[2] * asl
    comps = {
        "wbce": jax.lax.stop_gradient(wbce),
        "focal": jax.lax.stop_gradient(focal),
        "asl": jax.lax.stop_gradient(asl),
    }
    return total, comps
