#!/usr/bin/env python
"""MAE pretraining CLI: produce the MAE init the reference recipe starts from.

    python scripts/pretrain_mae.py --config <yaml> [--synthetic] \
        [--out vit-b_mae.pth] [--mask-ratio 0.75] \
        [--decoder-dim 512 --decoder-depth 4 --decoder-heads 8]

Trains :class:`gavit_tpu.models.mae.MAEViT` on UNLABELED images (the same
data tiers as supervised training — labels are simply ignored), then writes
the encoder as a reference-layout ``.pth`` (the format of
``vit-b_CXR_0.5M_mae.pth``, ``/root/reference/configs/baseline_config.yaml:23``)
consumable by ``model.pretrained_path`` here AND by the reference's own
loader. Data parallelism: the batch shards over the config mesh's 'data'
axis (one jitted donated-state step, bf16 by default).
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("GAVIT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

import gavit_tpu

logger = logging.getLogger("pretrain_mae")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="",
                   help="encoder .pth output path (default: "
                        "<save_dir>/mae_encoder.pth)")
    p.add_argument("--mask-ratio", type=float, default=0.75)
    p.add_argument("--decoder-dim", type=int, default=512)
    p.add_argument("--decoder-depth", type=int, default=4)
    p.add_argument("--decoder-heads", type=int, default=8)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    gavit_tpu.setup_compilation_cache()

    import optax

    from gavit_tpu.config import load_config
    from gavit_tpu.data import DataLoader
    from gavit_tpu.models.mae import MAEViT, export_reference_pth, mae_loss
    from gavit_tpu.ops.preprocess import train_preprocess
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training.schedule import warmup_cosine_schedule
    from gavit_tpu.utils import checkpoint as ckpt_lib

    config = load_config(args.config, args.overrides)
    tcfg, dcfg = config.training, config.data

    from scripts.train import create_datasets  # same tiers as supervised

    # one dataset factory for both modes so data.* overrides
    # (synthetic_size/seed/learnable, packed dirs) apply here too
    dataset, _ = create_datasets(
        config, synthetic=args.synthetic or not dcfg.train_dir)
    loader = DataLoader(dataset, dcfg.batch_size, shuffle=True,
                        num_workers=dcfg.num_workers, drop_last=True)

    dtype = jnp.bfloat16 if tcfg.precision == "bf16" else jnp.float32
    model = MAEViT(cfg=config.model, decoder_dim=args.decoder_dim,
                   decoder_depth=args.decoder_depth,
                   decoder_heads=args.decoder_heads,
                   mask_ratio=args.mask_ratio, dtype=dtype)

    n_patches = (config.model.img_size // config.model.patch_size) ** 2
    rng = jax.random.key(tcfg.seed)
    dummy = jnp.zeros((1, config.model.img_size, config.model.img_size,
                       config.model.in_chans), jnp.float32)
    params = model.init({"params": rng}, dummy,
                        jnp.zeros((1, n_patches)))["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"MAE params: {n_params:,} (mask ratio {args.mask_ratio})")

    steps_per_epoch = max(1, len(loader))
    total_steps = steps_per_epoch * tcfg.epochs
    schedule = warmup_cosine_schedule(
        tcfg.learning_rate, tcfg.warmup_epochs * steps_per_epoch,
        total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=config.optimizer.beta1,
                    b2=config.optimizer.beta2, eps=config.optimizer.eps,
                    weight_decay=tcfg.weight_decay),
    )
    opt_state = tx.init(params)
    mesh = make_mesh(config.mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, step, rng, images_u8):
        x = train_preprocess(
            images_u8, jax.random.fold_in(rng, 2 * step),
            use_affine=dcfg.augment_affine)
        noise = jax.random.uniform(
            jax.random.fold_in(rng, 2 * step + 1),
            (images_u8.shape[0], n_patches))

        def loss_fn(p):
            pred, mask = model.apply({"params": p}, x, noise)
            return mae_loss(pred, x.astype(jnp.float32), mask,
                            config.model.patch_size)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = 0
    for epoch in range(tcfg.epochs):
        t0 = time.perf_counter()
        for images, _labels in loader:  # labels ignored: unlabeled data
            images = shard_batch(mesh, np.asarray(images))
            params, opt_state, loss = train_step(
                params, opt_state, step, rng, images)
            step += 1
        dt = time.perf_counter() - t0
        logger.info(
            f"epoch {epoch}: loss {float(loss):.4f} "
            f"({steps_per_epoch * dcfg.batch_size / dt:.0f} img/s)")
        if (epoch + 1) % max(1, tcfg.save_freq) == 0 or \
                epoch == tcfg.epochs - 1:
            ckpt_lib.save(
                os.path.join(config.paths.save_dir, f"mae_epoch_{epoch}"),
                {"params": params, "step": jnp.int32(step)},
                {"epoch": epoch, "loss": float(loss),
                 "mask_ratio": args.mask_ratio},
            )

    out = args.out or os.path.join(config.paths.save_dir, "mae_encoder.pth")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    export_reference_pth(jax.device_get(params), out,
                         patch_size=config.model.patch_size,
                         in_chans=config.model.in_chans)
    logger.info(f"Wrote reference-layout MAE encoder: {out} — use it as "
                f"model.pretrained_path")
    return out


if __name__ == "__main__":
    main()
