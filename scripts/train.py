#!/usr/bin/env python
"""Train a Graph-Augmented ViT on TPU.

Same CLI semantics as the reference (``/root/reference/scripts/train.py``):

    python scripts/train.py --config configs/baseline_config.yaml \
        [--resume <checkpoint_dir>] [--synthetic]

Differences by design: ``--resume`` performs a FULL resume (params, optimizer
moments, schedule step, epoch, best-AUC) — the reference's resume restores
weights only and silently restarts at epoch 0 (``train.py:160-166``).
``--synthetic`` trains on the deterministic synthetic dataset (smoke runs on
machines without ChestX-ray14).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# escape hatch: GAVIT_PLATFORM=cpu forces the CPU backend even where a site
# profile pins jax_platforms to a TPU plugin (smoke runs, CI machines)
if os.environ.get("GAVIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

# multi-host: the distributed runtime must initialize before any backend use
# (SURVEY.md §2.6/§5 comm-backend row). GAVIT_COORDINATOR/NUM_PROCESSES/
# PROCESS_ID describe an explicit cluster (the 2-process CPU test uses this);
# GAVIT_MULTIHOST=1 lets jax auto-detect TPU-pod topology.
if os.environ.get("GAVIT_COORDINATOR"):
    jax.distributed.initialize(
        coordinator_address=os.environ["GAVIT_COORDINATOR"],
        num_processes=int(os.environ["GAVIT_NUM_PROCESSES"]),
        process_id=int(os.environ["GAVIT_PROCESS_ID"]),
    )
elif os.environ.get("GAVIT_MULTIHOST"):
    jax.distributed.initialize()

import gavit_tpu

gavit_tpu.setup_compilation_cache()

from gavit_tpu.config import load_config
from gavit_tpu.data import (
    ChestXrayDataset,
    DataLoader,
    PackedChestXrayDataset,
    SyntheticChestXrayDataset,
)
from gavit_tpu.models.vit import build_model, count_params, init_params
from gavit_tpu.parallel.mesh import make_mesh
from gavit_tpu.training import Trainer
from gavit_tpu.utils import log_dataset_info, log_system_info, setup_logging
from gavit_tpu.utils import wandb_compat
from gavit_tpu.utils import checkpoint as ckpt_lib
from gavit_tpu.utils.metrics import MetricCalculator
from gavit_tpu.utils.torch_convert import load_mae_weights

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser(
        description="Train Graph-Augmented Vision Transformer (TPU-native)"
    )
    p.add_argument("--config", type=str, default="configs/baseline_config.yaml",
                   help="Path to configuration file")
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint directory to resume from "
                        "('auto' = latest in save_dir)")
    p.add_argument("--synthetic", action="store_true",
                   help="Train on the synthetic dataset (no image files needed)")
    p.add_argument("--profile", type=str, default="",
                   help="Capture a profiler trace of the first training epoch "
                        "into this directory (Perfetto/XProf compatible)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE",
                   help="Override a config value (dotted keys, YAML-parsed "
                        "values), e.g. --set training.epochs=2 "
                        "--set mesh.data=1")
    return p.parse_args()


def create_datasets(config, synthetic: bool):
    d = config.data
    if synthetic or d.synthetic:
        train = SyntheticChestXrayDataset(
            size=d.synthetic_size, image_size=d.image_size,
            seed=config.training.seed, learnable=d.synthetic_learnable,
        )
        val = SyntheticChestXrayDataset(
            size=max(d.batch_size, d.synthetic_size // 8),
            image_size=d.image_size, seed=config.training.seed + 1,
            learnable=d.synthetic_learnable,
        )
        return train, val
    def open_split(directory, labels):
        # packed memmap (scripts/prepare_dataset.py) feeds at memcpy speed
        if PackedChestXrayDataset.is_packed(directory):
            return PackedChestXrayDataset(directory)
        return ChestXrayDataset(directory, labels, image_size=d.image_size)

    train = open_split(d.train_dir, d.train_labels)
    val = open_split(d.val_dir, d.val_labels)
    return train, val


def create_model(config, rng):
    # Tensor parallelism keeps the fused attention + graph kernels: the
    # head-partitioned SPMD rules (parallel/op_sharding.py) run each chip's
    # local heads, and the Trainer traces under jax.set_mesh so the layers
    # pin the head-sharded layout. Only the fused MLP megakernel steps
    # aside (its folded out-dropout cannot follow the row-parallel psum).
    impl = {"mlp_impl": "xla"} if config.mesh.model > 1 else {}
    model = build_model(
        config.model, precision=config.training.precision, **impl
    )
    params = init_params(model, rng)
    if config.model.pretrained_path and os.path.exists(config.model.pretrained_path):
        params = load_mae_weights(
            params, config.model.pretrained_path, depth=config.model.depth
        )
    return model, params


def main():
    args = parse_args()
    config = load_config(args.config, args.overrides)

    for dir_path in (config.paths.save_dir, config.paths.log_dir):
        Path(dir_path).mkdir(parents=True, exist_ok=True)
    setup_logging(config.to_dict())
    log_system_info()

    mesh = make_mesh(config.mesh)
    logger.info(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    run = wandb_compat.init(config, log_dir=config.paths.log_dir)
    try:
        train_ds, val_ds = create_datasets(config, args.synthetic)
        log_dataset_info(train_ds, val_ds)

        # each feeding GROUP supplies one stream of the global batch
        # (single-process: local == global). Groups come from the mesh, not
        # the process count: processes whose devices hold the same data-axis
        # coordinates (a model axis crossing hosts, e.g. pure-TP (1, n))
        # land in one group and feed identical data — data_feed_spec
        # resolves both the aligned and the shared-feeding layouts.
        from gavit_tpu.parallel.mesh import data_feed_spec

        shard_index, num_shards, _k = data_feed_spec(mesh)
        if config.data.batch_size % num_shards:
            raise ValueError(
                f"global batch {config.data.batch_size} not divisible by "
                f"the {num_shards} feeding streams of mesh "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))}"
            )
        local_bs = config.data.batch_size // num_shards
        shard = ((shard_index, num_shards)
                 if jax.process_count() > 1 else None)
        if config.data.loader == "grain":
            # checkpointable iteration: mid-epoch preemption resumes on the
            # next unseen sample (Trainer persists the iterator state)
            from gavit_tpu.data.grain_pipeline import GrainLoader

            train_loader = GrainLoader(
                train_ds, local_bs, shuffle=True,
                num_workers=config.data.num_workers, drop_last=True,
                seed=config.training.seed, shard=shard,
            )
            val_loader = GrainLoader(
                val_ds, local_bs, shuffle=False,
                num_workers=config.data.num_workers, shard=shard,
            )
        else:
            train_loader = DataLoader(
                train_ds, local_bs, shuffle=True,
                num_workers=config.data.num_workers, drop_last=True,
                seed=config.training.seed, shard=shard,
            )
            val_loader = DataLoader(
                val_ds, local_bs, shuffle=False,
                num_workers=config.data.num_workers, shard=shard,
            )

        model, params = create_model(config, jax.random.key(config.training.seed))
        logger.info(f"Created model with {count_params(params)} parameters")

        trainer = Trainer(
            model=model, model_params=params,
            train_loader=train_loader, val_loader=val_loader,
            config=config, wandb_run=run, mesh=mesh,
        )

        resume_path = args.resume
        if resume_path == "auto":
            resume_path = ckpt_lib.latest_checkpoint(config.paths.save_dir)
        if resume_path:
            if os.path.isdir(resume_path):
                trainer.restore_checkpoint(resume_path)
            else:
                logger.error(f"No checkpoint found at {resume_path}")

        if args.profile:
            from gavit_tpu.utils.profiling import trace

            logger.info(f"Profiling the first epoch into {args.profile}")
            with trace(args.profile):
                first_metrics = trainer.train_epoch()
            trainer.train_metrics_history.append(first_metrics)
            trainer.current_epoch += 1
            trainer.start_epoch = trainer.current_epoch

        final_metrics = trainer.train()
        logger.info("Training completed. Final metrics:")
        for name, value in final_metrics.items():
            logger.info(f"{name}: {value:.4f}")

        MetricCalculator(train_ds.disease_names).plot_metrics(
            trainer.train_metrics_history,
            save_dir=os.path.join(config.paths.save_dir, "figures"),
        )
        # the reference's training_progress artifacts (per-metric progress
        # plots + the combined panel) into figures/training_progress/
        if trainer.train_metrics_history and trainer.val_metrics_history:
            from gavit_tpu.utils.visualization import VisualizationManager

            VisualizationManager(
                os.path.join(config.paths.save_dir, "figures"),
                train_ds.disease_names,
            ).plot_training_progress(
                trainer.train_metrics_history, trainer.val_metrics_history,
            )
    except Exception as e:
        logger.error(f"Training failed with error: {e}")
        raise
    finally:
        run.finish()
        logger.info("Training script completed")


if __name__ == "__main__":
    main()
