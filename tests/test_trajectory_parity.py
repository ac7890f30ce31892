"""Trajectory-level training parity vs the PyTorch reference update rule.

Forward parity (tests/test_parity.py, test_golden_reference.py) pins logits
to 1e-3; each training ingredient is unit-matched (schedule, losses, clip
scope). This file closes the remaining gap (r4 VERDICT #2): K full optimizer
steps of the REAL ``Trainer``'s jitted train step against a torch trainer
that transcribes the reference's update semantics exactly
(``/root/reference/src/training/trainer.py:47-56,77-87,110-123`` — AdamW
over [model @ lr, criterion λ @ 0.1·lr] with weight decay on both groups,
per-step LambdaLR warmup→cosine stepped AFTER the optimizer, global-norm
clip of the model gradients only). Any divergence in AdamW bias correction,
weight-decay coupling, λ-group handling, clip order, or schedule indexing
shows up as trajectory drift that forward parity cannot see.

Identical fixed data feeds both sides; fp32, dropout off. K=12 crosses the
warmup→cosine boundary (warmup_steps=10), so both schedule segments are
exercised against live optimizer state.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model
from gavit_tpu.training import Trainer
from gavit_tpu.utils.torch_convert import torch_state_dict_to_params
from tests.torch_ref import (
    TorchRefCriterion,
    TorchRefTrainer,
    TorchRefViT,
    reference_state_dict,
)

K = 12
BATCH = 8
IMG, PATCH, EMBED, DEPTH, HEADS, CLASSES = 64, 16, 192, 2, 3, 14
LR, WD = 1e-3, 0.05


def _fixed_batches(seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((K, BATCH, IMG, IMG, 3)).astype(np.float32)
    targets = (rng.uniform(size=(K, BATCH, CLASSES)) < 0.3).astype(np.float32)
    return images, targets


@pytest.fixture(scope="module")
def trajectories(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("traj")
    images, targets = _fixed_batches()

    # ---- shared init: torch model is the source of truth ----
    torch.manual_seed(0)
    tmodel = TorchRefViT(img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
                         depth=DEPTH, num_heads=HEADS, num_classes=CLASSES)
    sd = reference_state_dict(tmodel)

    # ---- JAX side: the real Trainer, its real jitted step ----
    ds = SyntheticChestXrayDataset(size=80, image_size=IMG, seed=0)
    steps_per_epoch = 80 // BATCH          # -> warmup_steps 10, total 30
    cfg = from_dict({
        "model": {"name": "custom", "img_size": IMG, "patch_size": PATCH,
                  "embed_dim": EMBED, "depth": DEPTH, "num_heads": HEADS,
                  "num_classes": CLASSES, "drop_rate": 0.0,
                  "drop_path_rate": 0.0, "graph": {"enabled": False}},
        "data": {"batch_size": BATCH, "image_size": IMG},
        "training": {"epochs": 3, "warmup_epochs": 1, "learning_rate": LR,
                     "weight_decay": WD, "precision": "fp32",
                     "early_stopping_patience": 10},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = torch_state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, depth=DEPTH)
    tl = DataLoader(ds, BATCH, shuffle=False, num_workers=0)
    trainer = Trainer(model, params, tl, tl, cfg)
    pos_weight = np.asarray(trainer.pos_weight)

    j_losses = []
    state = trainer.state
    for i in range(K):
        state, metrics, _ = trainer._train_step(
            state, trainer.base_rng, images[i], targets[i])
        j_losses.append(float(metrics["loss"]))
    j_params = jax_tree_to_numpy(state.params)

    # ---- torch side: the reference update rule, step for step ----
    tcrit = TorchRefCriterion(torch.from_numpy(pos_weight.astype(np.float32)))
    ttrainer = TorchRefTrainer(
        tmodel, tcrit, lr=LR, weight_decay=WD, max_grad_norm=1.0,
        warmup_steps=steps_per_epoch * 1, total_steps=steps_per_epoch * 3)
    t_losses = []
    for i in range(K):
        x = torch.from_numpy(images[i].transpose(0, 3, 1, 2)).contiguous()
        t_losses.append(ttrainer.step(x, torch.from_numpy(targets[i])))

    t_params = torch_state_dict_to_params(
        {k: v.numpy() for k, v in reference_state_dict(tmodel).items()},
        depth=DEPTH)
    t_lambdas = {
        "lambda_wbce": float(tcrit.lambda_wbce.detach()),
        "lambda_focal": float(tcrit.lambda_focal.detach()),
        "lambda_asl": float(tcrit.lambda_asl.detach()),
    }
    return j_losses, j_params, t_losses, jax_tree_to_numpy(t_params), t_lambdas


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def test_loss_trajectory_matches(trajectories):
    j_losses, _, t_losses, _, _ = trajectories
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-4, atol=1e-6)
    # the trajectory must actually move — a frozen model would "agree"
    assert abs(j_losses[-1] - j_losses[0]) > 1e-5


def test_model_param_trajectory_matches(trajectories):
    """Every model parameter after K real optimizer steps within 1e-4 rel
    of the torch reference trajectory (catches AdamW bias-correction /
    decay-coupling / clip-order divergence)."""
    import jax

    _, j_params, _, t_params, _ = trajectories
    j_leaves = jax.tree_util.tree_leaves_with_path(j_params["model"])
    t_model = t_params
    t_flat = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(t_model)}
    assert len(j_leaves) == len(t_flat)
    for path, jv in j_leaves:
        tv = t_flat[jax.tree_util.keystr(path)]
        diff = np.abs(jv - tv)
        # combined bar: 1e-4 rel for the bulk, 5e-5 abs headroom for the
        # handful of tiny-gradient elements where Adam's ε-region direction
        # is fp32-noise-sensitive (measured ceiling 3.5e-5 abs; a systematic
        # update-rule divergence — wrong bias correction, coupled decay,
        # schedule off-by-one — moves params orders of magnitude more)
        bound = 5e-5 + 1e-4 * np.abs(tv)
        assert (diff <= bound).all(), (
            f"{jax.tree_util.keystr(path)}: max drift {diff.max():.2e}")
        # and the typical element must track far tighter than the bar
        assert np.median(diff) < 2e-6, (
            f"{jax.tree_util.keystr(path)}: median drift "
            f"{np.median(diff):.2e}")


def test_criterion_lambda_trajectory_matches(trajectories):
    """The λ group rides the 0.1·lr schedule WITH weight decay (torch
    applies the top-level decay to the criterion group too)."""
    _, j_params, _, _, t_lambdas = trajectories
    for name, tv in t_lambdas.items():
        jv = float(j_params["criterion"][name])
        assert tv != 1.0          # the λs must have moved off their init
        np.testing.assert_allclose(jv, tv, rtol=1e-5, atol=1e-7)
