"""DynamicWeightedLoss parity vs the reference math, computed independently
with torch.nn.functional (the reference composes F.binary_cross_entropy etc.,
``/root/reference/src/training/losses.py:26-68``)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gavit_tpu.training.losses import (
    bce_with_logits,
    dynamic_weighted_loss,
    get_loss_weights,
    init_criterion_params,
)


def _data(b=16, c=14, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, c)).astype(np.float32) * 3
    targets = (rng.random((b, c)) < 0.3).astype(np.float32)
    pos_weight = rng.uniform(0.5, 20.0, c).astype(np.float32)
    return logits, targets, pos_weight


def _torch_components(logits, targets, pos_weight):
    x, t = torch.from_numpy(logits), torch.from_numpy(targets)
    pw = torch.from_numpy(pos_weight)
    wbce = F.binary_cross_entropy_with_logits(x, t, pos_weight=pw)
    bce = F.binary_cross_entropy_with_logits(x, t, reduction="none")
    pt = torch.exp(-bce)
    focal = ((1 - pt) ** 2.0 * bce).mean()
    xs_pos = torch.sigmoid(x)
    xs_neg = 1 - xs_pos
    los_pos = t * torch.log(torch.clamp(xs_pos, min=1e-8)) * (1 - xs_pos) ** 1
    los_neg = (1 - t) * torch.log(torch.clamp(xs_neg, min=1e-8)) * xs_pos ** 4
    asl = -(los_pos + los_neg).mean()
    return float(wbce), float(focal), float(asl)


def test_component_losses_match_torch():
    logits, targets, pos_weight = _data()
    cp = init_criterion_params()
    _, comps = dynamic_weighted_loss(
        cp, jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_weight)
    )
    wbce_t, focal_t, asl_t = _torch_components(logits, targets, pos_weight)
    assert abs(float(comps["wbce"]) - wbce_t) < 1e-5
    assert abs(float(comps["focal"]) - focal_t) < 1e-5
    assert abs(float(comps["asl"]) - asl_t) < 1e-5


def test_total_is_softmax_weighted_combination():
    logits, targets, pos_weight = _data(seed=1)
    cp = {
        "lambda_wbce": jnp.float32(2.0),
        "lambda_focal": jnp.float32(-1.0),
        "lambda_asl": jnp.float32(0.5),
    }
    total, comps = dynamic_weighted_loss(
        cp, jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_weight)
    )
    w = np.asarray(get_loss_weights(cp))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    expected = (
        w[0] * float(comps["wbce"])
        + w[1] * float(comps["focal"])
        + w[2] * float(comps["asl"])
    )
    assert abs(float(total) - expected) < 1e-5


def test_lambdas_receive_gradients_but_components_are_detached():
    logits, targets, pos_weight = _data(seed=2)

    def f(cp):
        total, _ = dynamic_weighted_loss(
            cp, jnp.asarray(logits), jnp.asarray(targets),
            jnp.asarray(pos_weight),
        )
        return total

    g = jax.grad(f)(init_criterion_params())
    # λ grads sum to ~0 (softmax) but are individually nonzero
    vals = np.array([float(v) for v in g.values()])
    assert np.abs(vals).max() > 0
    np.testing.assert_allclose(vals.sum(), 0.0, atol=1e-6)


def test_bce_numerical_stability_extreme_logits():
    x = jnp.asarray([[50.0, -50.0, 0.0]])
    t = jnp.asarray([[1.0, 0.0, 1.0]])
    out = np.asarray(bce_with_logits(x, t))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, :2], 0.0, atol=1e-6)


def test_equal_lambdas_give_equal_weights():
    w = np.asarray(get_loss_weights(init_criterion_params()))
    np.testing.assert_allclose(w, 1 / 3, atol=1e-6)
