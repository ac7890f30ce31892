"""LR schedule parity vs the reference LambdaLR formula
(``trainer.py:77-87``) computed with torch, and optimizer group behavior
(criterion λ at 0.1×lr, model-only grad clipping — ``trainer.py:47-56,114-116``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from gavit_tpu.config import from_dict
from gavit_tpu.training.losses import init_criterion_params
from gavit_tpu.training.optimizer import make_optimizer
from gavit_tpu.training.schedule import warmup_cosine_schedule


def test_schedule_matches_torch_lambdalr():
    lr, warmup, total = 1e-4, 10, 100
    sched = warmup_cosine_schedule(lr, warmup, total)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)

    def lr_lambda(step):
        if step < warmup:
            return float(step) / float(max(1, warmup))
        progress = float(step - warmup) / float(max(1, total - warmup))
        return 0.5 * (1.0 + np.cos(np.pi * progress))

    tsched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    for step in range(total):
        torch_lr = tsched.get_last_lr()[0]
        ours = float(sched(step))
        assert abs(ours - torch_lr) < 1e-10, f"step {step}: {ours} vs {torch_lr}"
        opt.step()
        tsched.step()


def test_first_step_lr_is_zero():
    sched = warmup_cosine_schedule(1e-4, 10, 100)
    assert float(sched(0)) == 0.0


def test_criterion_group_runs_at_tenth_lr():
    cfg = from_dict({
        "training": {"epochs": 1, "warmup_epochs": 0, "learning_rate": 1e-2,
                     "weight_decay": 0.0, "max_grad_norm": 0.0},
    })
    tx = make_optimizer(cfg, steps_per_epoch=100)
    params = {
        "model": {"w": jnp.ones((4,))},
        "criterion": init_criterion_params(),
    }
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # take several steps so adam moments stabilise toward update ≈ lr
    updates = None
    for _ in range(200):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    model_step = abs(float(updates["model"]["w"][0]))
    crit_step = abs(float(updates["criterion"]["lambda_wbce"]))
    ratio = crit_step / model_step
    assert 0.05 < ratio < 0.2, f"criterion/model update ratio {ratio}"


def test_grad_clip_applies_to_model_only():
    cfg = from_dict({
        "training": {"epochs": 1, "warmup_epochs": 0, "learning_rate": 1.0,
                     "weight_decay": 0.0, "max_grad_norm": 1.0},
    })
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {
        "model": {"w": jnp.zeros((4,))},
        "criterion": init_criterion_params(),
    }
    opt_state = tx.init(params)
    huge = jax.tree.map(lambda x: jnp.full_like(x, 1e6), params)
    updates, _ = tx.update(huge, opt_state, params)
    # both branches produce finite updates; the model grad was pre-clipped
    assert np.isfinite(np.asarray(updates["model"]["w"])).all()
    assert np.isfinite(float(updates["criterion"]["lambda_wbce"]))


def test_weight_decay_mask_option():
    """weight_decay_all_params=False exempts LN/bias/gate/embeddings."""
    import numpy as np

    cfg = from_dict({
        "training": {"epochs": 1, "warmup_epochs": 0, "learning_rate": 0.0,
                     "weight_decay": 0.1, "max_grad_norm": 0.0,
                     "weight_decay_all_params": False},
    })
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {
        "model": {
            "norm": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
            "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.ones((2,))},
            "cls_token": jnp.ones((1, 1, 4)),
        },
        "criterion": init_criterion_params(),
    }
    opt_state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, opt_state, params)
    # lr is 0 → any update comes only from decay; decay is masked off for
    # everything except the 2D kernel... and lr=0 scales that away too, so
    # instead check with lr>0 that masked params stay put
    cfg2 = from_dict({
        "training": {"epochs": 1, "warmup_epochs": 0, "learning_rate": 1.0,
                     "weight_decay": 0.1, "max_grad_norm": 0.0,
                     "weight_decay_all_params": False},
    })
    tx2 = make_optimizer(cfg2, steps_per_epoch=10)
    opt_state2 = tx2.init(params)
    updates2 = None
    st = opt_state2
    for _ in range(3):
        updates2, st = tx2.update(zero_grads, st, params)
    assert float(jnp.abs(updates2["model"]["norm"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates2["model"]["head"]["bias"]).max()) == 0.0
    assert float(jnp.abs(updates2["model"]["cls_token"]).max()) == 0.0
    assert float(jnp.abs(updates2["model"]["head"]["kernel"]).max()) > 0.0


def test_default_decays_everything_like_torch():
    cfg = from_dict({
        "training": {"epochs": 1, "warmup_epochs": 0, "learning_rate": 1.0,
                     "weight_decay": 0.1, "max_grad_norm": 0.0},
    })
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {
        "model": {"norm": {"scale": jnp.ones((4,))}},
        "criterion": init_criterion_params(),
    }
    st = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates = None
    for _ in range(3):
        updates, st = tx.update(zero_grads, st, params)
    assert float(jnp.abs(updates["model"]["norm"]["scale"]).max()) > 0.0

