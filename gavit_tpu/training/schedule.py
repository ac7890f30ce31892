"""Per-step LR schedule: linear warmup → cosine decay to 0.

Exact formula of the reference's LambdaLR (``trainer.py:77-87``):
  step <  warmup: lr · step / warmup
  step >= warmup: lr · 0.5 · (1 + cos(π · (step - warmup)/(total - warmup)))

Stepped per batch; the first optimizer update runs at multiplier 0 (matching
the reference's LambdaLR initial state).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int):
    warmup_steps = max(1, int(warmup_steps))
    decay_span = max(1, int(total_steps) - warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        progress = (step - warmup_steps) / decay_span
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule
