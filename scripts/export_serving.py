#!/usr/bin/env python
"""Export a self-contained serving artifact (serialized StableHLO + weights).

    python scripts/export_serving.py --config <yaml> --checkpoint <ckpt_dir> \
        --out artifact_dir [--precision bf16|fp32] [--tome-r R] \
        [--buckets 1,8,32,128] [--platforms tpu,cpu]

The artifact replays without this package's model code: deployment needs
only the jax runtime (``gavit_tpu.serving.ExportedPredictor``) or any
StableHLO consumer. ``--platforms tpu,cpu`` cross-lowers so an artifact
exported on a CPU box serves on TPU (and vice versa).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32", "int8"])
    p.add_argument("--calib", default="",
                   help="int8: .npy of uint8 calibration images "
                        "[N, S, S, 3] (unneeded for QAT checkpoints — "
                        "their trained scales ride along)")
    p.add_argument("--tome-r", type=int, default=0)
    p.add_argument("--buckets", default="1,8,32,128",
                   help="comma-separated batch buckets to compile/export")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms (e.g. tpu,cpu); "
                        "default: the current backend")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    from gavit_tpu.config import load_config
    from gavit_tpu.serving import export_serving

    config = load_config(args.config, args.overrides)
    calib = None
    if args.calib:
        import numpy as np

        calib = np.load(args.calib)
    manifest = export_serving(
        config, args.out,
        checkpoint_path=args.checkpoint or None,
        precision=args.precision,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        tome_r=args.tome_r,
        platforms=([s.strip() for s in args.platforms.split(",")]
                   if args.platforms else None),
        calibration_images=calib,
    )
    logging.info("Exported %s (buckets %s, platforms %s) -> %s",
                 manifest["model"], manifest["buckets"],
                 manifest["platforms"], args.out)


if __name__ == "__main__":
    main()
