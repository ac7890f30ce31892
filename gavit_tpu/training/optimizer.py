"""Optimizer wiring (optax) mirroring the reference's two-param-group AdamW.

Reference (``trainer.py:47-56``): AdamW over [model params @ lr, criterion λs
@ 0.1·lr], weight decay 0.05 on *all* params (torch AdamW applies decoupled
decay to every param in the group), β=(0.9, 0.999), ε=1e-8, per-step
warmup+cosine schedule, and global-norm clipping of the **model** gradients
only (``trainer.py:114-116`` clips ``model.parameters()``, not the λs).

On TPU bf16 training needs no loss scaler (bf16 has fp32's exponent range),
so the reference's GradScaler machinery (``trainer.py:59-60,110-120``) has no
equivalent here by design.
"""

from __future__ import annotations

import jax
import optax

from gavit_tpu.config import Config
from gavit_tpu.training.schedule import warmup_cosine_schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the optimizer over params of shape {'model': ..., 'criterion': ...}."""
    tr, op = cfg.training, cfg.optimizer
    total_steps = steps_per_epoch * tr.epochs
    warmup_steps = steps_per_epoch * tr.warmup_epochs
    sched_model = warmup_cosine_schedule(tr.learning_rate, warmup_steps, total_steps)
    sched_crit = warmup_cosine_schedule(
        tr.learning_rate * tr.criterion_lr_scale, warmup_steps, total_steps
    )

    def decay_mask(params):
        """True where weight decay applies. Default decays everything like
        torch AdamW / the reference; weight_decay_all_params=False exempts
        LayerNorm scales/biases, other biases, gates and embeddings."""
        if tr.weight_decay_all_params:
            return jax.tree.map(lambda _: True, params)

        def mask_entry(path, leaf):
            keys = [getattr(p, "key", str(p)) for p in path]
            name = keys[-1] if keys else ""
            if name in ("bias", "scale", "gate") or name.endswith("_bias"):
                # *_bias covers the MoE expert banks' stacked biases
                # ([E, F] — ndim 2, but still biases)
                return False
            if any(k in ("cls_token", "pos_embed") for k in keys):
                return False
            return leaf.ndim >= 2

        return jax.tree_util.tree_map_with_path(mask_entry, params)

    def adamw(schedule):
        return optax.adamw(
            learning_rate=schedule,
            b1=op.beta1,
            b2=op.beta2,
            eps=op.eps,
            weight_decay=tr.weight_decay,
            mask=None if tr.weight_decay_all_params else decay_mask,
        )

    model_tx = adamw(sched_model)
    if tr.max_grad_norm and tr.max_grad_norm > 0:
        model_tx = optax.chain(
            optax.clip_by_global_norm(tr.max_grad_norm), model_tx
        )

    def label_fn(params):
        return {
            "model": jax.tree.map(lambda _: "model", params["model"]),
            "criterion": jax.tree.map(lambda _: "criterion", params["criterion"]),
        }

    return optax.multi_transform(
        {"model": model_tx, "criterion": adamw(sched_crit)}, label_fn
    )
