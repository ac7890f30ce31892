#!/usr/bin/env python
"""ViT-L/16+graph2 serving throughput (bf16 + int8) on the live backend.

The r4 megakernel-VMEM fix also enables the fused INFERENCE kernel at
ViT-L (its 16.8 MB weight set was over the old 16 MB cap) — this measures
the serving path to record the family's inference row.

    JAX_PLATFORMS='' python tools/r4_vitl_infer.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()

from gavit_tpu.config import from_dict  # noqa: E402
from gavit_tpu.serving import Predictor  # noqa: E402


def bench(pred, imgs, iters=30):
    _ = pred.predict_proba(imgs)  # compile (+ sync via np return)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pred.predict_proba(imgs)
    _ = float(out.sum())
    return (time.perf_counter() - t0) / iters * 1000


def main():
    cfg = from_dict({
        "model": {"name": "vit_large_16", "img_size": 224, "patch_size": 16,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8, "dynamic": True}},
        "data": {"image_size": 224},
    })
    imgs = np.random.default_rng(0).integers(
        0, 255, (64, 224, 224, 3), np.uint8)
    for precision in ("bf16", "int8"):
        t0 = time.perf_counter()
        pred = Predictor(cfg, None, precision=precision, buckets=(64,))
        pred.warmup()
        print(f"{precision} warmup: {time.perf_counter() - t0:.0f}s",
              flush=True)
        ms = bench(pred, imgs)
        print(f"ViT-L infer b64 {precision}: {ms:.1f} ms/batch -> "
              f"{64 / ms * 1000:.0f} img/s/chip "
              f"(backend={jax.default_backend()})", flush=True)


if __name__ == "__main__":
    main()
