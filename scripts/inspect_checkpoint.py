#!/usr/bin/env python
"""Checkpoint inspection / debugging utility.

Counterpart of the reference's manual checkpoint-debug script
(``/root/reference/src/utils/test_checkpoint.py``), which exists to diagnose
unpickling failures across numpy versions. Orbax checkpoints are
language-neutral (no pickle), so this tool focuses on what's actually useful:
structure, shapes, dtypes, metadata, and basic health stats — and can also
dump the layout of a PyTorch ``.pt``/``.pth`` file for conversion debugging.

    python scripts/inspect_checkpoint.py <checkpoint_dir_or_pt_file> [--stats]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("GAVIT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

import numpy as np


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for key in sorted(tree):
            yield from _walk(tree[key], f"{prefix}{key}.")
    elif isinstance(tree, (list, tuple)):
        # orbax restores optimizer namedtuples/chains as sequences
        for i, item in enumerate(tree):
            yield from _walk(item, f"{prefix}{i}.")
    else:
        yield prefix.rstrip("."), tree


def inspect_orbax(path: str, stats: bool):
    from gavit_tpu.utils.checkpoint import restore_unstructured

    state, meta = restore_unstructured(path)
    if meta:
        print("== metadata ==")
        print(json.dumps({k: v for k, v in meta.items() if k != "config"},
                         indent=2, default=str)[:2000])
    print("== state tree ==")
    total = 0
    for name, leaf in _walk(state):
        arr = np.asarray(leaf)
        total += arr.size
        line = f"{name:70s} {str(arr.dtype):9s} {arr.shape}"
        if stats and arr.size and np.issubdtype(arr.dtype, np.floating):
            line += (f"  mean={arr.mean():+.4e} std={arr.std():.4e}"
                     f" finite={np.isfinite(arr).all()}")
        print(line)
    print(f"== total: {total:,} elements ==")


def inspect_torch(path: str, stats: bool):
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:
        ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and not all(
        hasattr(v, "shape") for v in ckpt.values()
    ):
        print(f"== top-level keys: {sorted(ckpt.keys())} ==")
        for key in ("model", "model_state_dict", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                print(f"== descending into {key!r} ==")
                break
    total = 0
    for name in sorted(ckpt):
        v = ckpt[name]
        if hasattr(v, "shape"):
            arr = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            total += arr.size
            line = f"{name:70s} {str(arr.dtype):9s} {tuple(arr.shape)}"
            if stats and np.issubdtype(arr.dtype, np.floating):
                line += f"  mean={arr.mean():+.4e} std={arr.std():.4e}"
            print(line)
        else:
            print(f"{name:70s} <{type(v).__name__}>")
    print(f"== total: {total:,} elements ==")


def inspect_artifact(path: str, stats: bool):
    """export_serving artifact: manifest + per-leaf weight summary."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    print("== serving-export manifest ==")
    print(json.dumps(manifest, indent=2)[:2000])
    z = np.load(os.path.join(path, "weights.npz"))
    total = 0
    for i in range(manifest["n_weights"]):
        arr = z[str(i)]
        total += arr.size
        dt = manifest.get("leaf_dtypes", [str(arr.dtype)] * (i + 1))[i]
        line = f"weight[{i:4d}] {dt:9s} {arr.shape}"
        if stats and arr.size and np.issubdtype(arr.dtype, np.floating):
            line += f"  mean={arr.mean():+.4e} std={arr.std():.4e}"
        print(line)
    print(f"== total: {total:,} elements; programs: "
          f"{[f'predict_b{b}.shlo' for b in manifest['buckets']]} ==")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("--stats", action="store_true",
                        help="print mean/std/finiteness per tensor")
    args = parser.parse_args()

    if os.path.isdir(args.path):
        if os.path.exists(os.path.join(args.path, "manifest.json")):
            inspect_artifact(args.path, args.stats)
        else:
            inspect_orbax(args.path, args.stats)
    else:
        inspect_torch(args.path, args.stats)


if __name__ == "__main__":
    main()
