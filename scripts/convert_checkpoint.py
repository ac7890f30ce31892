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


def main():
    p = argparse.ArgumentParser()
    direction = p.add_mutually_exclusive_group(required=True)
    direction.add_argument("--to-jax", action="store_true")
    direction.add_argument("--to-torch", action="store_true")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default="configs/baseline_config.yaml")
    args = p.parse_args()
    if args.to_jax:
        to_jax(args.src, args.dst, args.config)
    else:
        to_torch(args.src, args.dst)


if __name__ == "__main__":
    main()
