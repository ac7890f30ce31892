#!/usr/bin/env python
"""MAE pretraining throughput on the TPU (BASELINE.md row).

ViT-B/16 encoder @224px, mask 0.75 (encoder sees 50 of 197 tokens),
decoder 512x4: one jitted donated-state step (preprocess + fwd + bwd +
AdamW) on device-resident uint8 batches, scalar-fetch sync.

Run detached: nohup python tools/r3_mae_tpu.py >> logs/r3_mae_tpu.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    import optax

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.mae import MAEViT, mae_loss
    from gavit_tpu.ops.preprocess import train_preprocess
    from gavit_tpu.training.schedule import warmup_cosine_schedule

    on_tpu = jax.default_backend() == "tpu"
    img = 224 if on_tpu else 32
    patch = 16 if on_tpu else 8
    name = "vit_base_16" if on_tpu else "custom"
    n_steps = 20 if on_tpu else 3

    cfg = from_dict({
        "model": ({"name": name, "img_size": img, "patch_size": patch,
                   "num_classes": 14} if on_tpu else
                  {"name": name, "img_size": img, "patch_size": patch,
                   "embed_dim": 64, "depth": 2, "num_heads": 2,
                   "num_classes": 14}),
    })
    n_patches = (img // patch) ** 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    dec = dict(decoder_dim=512, decoder_depth=4, decoder_heads=8) if on_tpu \
        else dict(decoder_dim=64, decoder_depth=1, decoder_heads=2)
    model = MAEViT(cfg=cfg.model, mask_ratio=0.75, dtype=dtype, **dec)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng}, jnp.zeros((1, img, img, 3), jnp.float32),
        jnp.zeros((1, n_patches)))["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(warmup_cosine_schedule(1.5e-4, 100, 10000)))
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, i, u8):
        x = train_preprocess(u8, jax.random.fold_in(rng, 2 * i),
                             use_affine=False)
        noise = jax.random.uniform(jax.random.fold_in(rng, 2 * i + 1),
                                   (u8.shape[0], n_patches))

        def lf(p):
            pred, mask = model.apply({"params": p}, x, noise)
            return mae_loss(pred, x.astype(jnp.float32), mask, patch)

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    for batch in ((256, 384, 512) if on_tpu else (8,)):
      try:
        u8 = jax.device_put(np.random.default_rng(0).integers(
            0, 256, (batch, img, img, 3), np.uint8))
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, 0, u8)
        print(f"b{batch}: compile+1st {time.perf_counter() - t0:.0f}s "
              f"loss {float(loss):.4f}", flush=True)
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            params, opt_state, loss = step(params, opt_state, i, u8)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        print(f"MAE b{batch}: {dt * 1000:.1f} ms/step -> "
              f"{batch / dt:.0f} img/s/chip", flush=True)
      except Exception as e:  # e.g. HBM OOM at the largest batch
        print(f"MAE b{batch}: failed ({type(e).__name__}): "
              f"{str(e)[:200]}", flush=True)
        break


if __name__ == "__main__":
    main()
