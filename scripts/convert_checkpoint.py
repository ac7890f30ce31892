#!/usr/bin/env python
"""Bidirectional checkpoint conversion: PyTorch (reference layout) ↔ orbax.

    # torch .pt/.pth (reference/MAE layout) → orbax params checkpoint
    python scripts/convert_checkpoint.py --to-jax model.pth out_dir \
        --config configs/baseline_config.yaml

    # orbax checkpoint → torch-layout .npz (consumable by torch via numpy)
    python scripts/convert_checkpoint.py --to-torch ckpt_dir out.npz

The torch→jax direction mirrors the reference's MAE loading semantics
(``/root/reference/src/models/vit.py:182-200``): head weights are dropped,
position embeddings interpolate across grid sizes.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("GAVIT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def to_jax(src: str, dst: str, config_path: str):
    import jax

    from gavit_tpu.config import load_config
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.utils import checkpoint as ckpt_lib
    from gavit_tpu.utils.torch_convert import load_mae_weights

    config = load_config(config_path)
    model = build_model(config.model, precision="fp32")
    params = init_params(model, jax.random.key(config.training.seed))
    params = load_mae_weights(params, src, depth=config.model.depth)
    from gavit_tpu.training.losses import init_criterion_params

    ckpt_lib.save(
        dst,
        {"step": jax.numpy.zeros((), jax.numpy.int32),
         "params": {"model": params, "criterion": init_criterion_params()}},
        {"converted_from": src, "config": config.to_dict()},
    )
    logger.info(f"Wrote orbax checkpoint: {dst}")


def to_torch(src: str, dst: str):
    import numpy as np

    from gavit_tpu.utils import checkpoint as ckpt_lib
    from gavit_tpu.utils.torch_convert import params_to_torch_state_dict

    state, _ = ckpt_lib.restore_unstructured(src)
    params = state["params"]["model"] if "params" in state else state
    sd = params_to_torch_state_dict(params)
    np.savez(dst, **{k: np.asarray(v) for k, v in sd.items()})
    logger.info(f"Wrote torch-layout npz: {dst} ({len(sd)} tensors)")


def upcycle_moe(src: str, dst: str, config_path: str,
                overrides: list[str] | None = None):
    """Sparse upcycling: dense checkpoint → MoE-init checkpoint.

    ``--config`` must describe the MoE model (``model.moe.enabled: true``);
    the source checkpoint holds the SAME architecture with moe disabled.
    Every expert starts as the block's trained dense MLP, the router at
    zero — the upcycled model reproduces the dense forward exactly when
    ``capacity_factor >= num_experts / k`` (``models/moe.py``)."""
    import dataclasses

    import jax

    from gavit_tpu.config import MoEConfig, load_config
    from gavit_tpu.models.moe import upcycle_params
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training.losses import init_criterion_params
    from gavit_tpu.utils import checkpoint as ckpt_lib

    config = load_config(config_path, overrides)
    if not config.model.moe.enabled:
        raise SystemExit("--upcycle-moe needs model.moe.enabled: true "
                         "in --config")
    state, _ = ckpt_lib.restore_unstructured(src)
    dense_params = (state["params"]["model"]
                    if "params" in state else state)
    criterion = (state["params"].get("criterion")
                 if "params" in state else None)

    moe_model = build_model(config.model, precision="fp32")
    moe_init = init_params(moe_model, jax.random.key(config.training.seed))
    params = upcycle_params(dense_params, moe_init, config.model)
    # the restored dense leaves may carry a multi-device sharding while the
    # fresh MoE leaves are single-device — normalise to host arrays so the
    # written checkpoint is placement-free
    import numpy as np

    params = jax.tree.map(np.asarray, params)

    # sanity: the dense tree really was this architecture without MoE
    dense_cfg = dataclasses.replace(config.model, moe=MoEConfig())
    probe = init_params(build_model(dense_cfg, precision="fp32"),
                        jax.random.key(0))
    missing = [k for k in probe if k not in dense_params]
    if missing:
        raise SystemExit(f"source checkpoint lacks {missing}; it must be "
                         "the same architecture with moe disabled")

    ckpt_lib.save(
        dst,
        {"step": jax.numpy.zeros((), jax.numpy.int32),
         "params": {"model": params,
                    "criterion": criterion or init_criterion_params()}},
        {"upcycled_from": src, "config": config.to_dict()},
    )
    logger.info(f"Wrote upcycled MoE checkpoint: {dst}")


def main():
    p = argparse.ArgumentParser()
    direction = p.add_mutually_exclusive_group(required=True)
    direction.add_argument("--to-jax", action="store_true")
    direction.add_argument("--to-torch", action="store_true")
    direction.add_argument(
        "--upcycle-moe", action="store_true",
        help="dense orbax checkpoint -> MoE-init checkpoint "
             "(sparse upcycling; --config describes the MoE model)")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default="configs/baseline_config.yaml")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted-key config overrides")
    args = p.parse_args()
    if args.to_jax:
        to_jax(args.src, args.dst, args.config)
    elif args.upcycle_moe:
        upcycle_moe(args.src, args.dst, args.config, args.overrides)
    else:
        to_torch(args.src, args.dst)


if __name__ == "__main__":
    main()
