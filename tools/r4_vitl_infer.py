#!/usr/bin/env python
"""ViT-L/16+graph2 inference throughput (bf16 + int8) — chip capability.

The r4 megakernel-VMEM fix also enables the fused INFERENCE kernel at
ViT-L (its 16.8 MB weight set was over the old 16 MB cap). Device-resident
uint8 batches, like bench.py — this machine's relay tunnel moves H2D at
~40 MB/s, so a Predictor.predict_proba loop would measure the tunnel
(measured: 397 ms/batch ≈ the 9.6 MB transfer), not the chip.

    JAX_PLATFORMS='' python tools/r4_vitl_infer.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()

from gavit_tpu.config import from_dict  # noqa: E402
from gavit_tpu.models.vit import build_model, init_params  # noqa: E402
from gavit_tpu.ops.preprocess import val_preprocess  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


def main():
    cfg = from_dict({
        "model": {"name": "vit_large_16", "img_size": 224, "patch_size": 16,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8, "dynamic": True}},
        "data": {"image_size": 224},
    })
    model = build_model(cfg.model, precision="bf16")
    params = init_params(model, jax.random.key(0))
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    u8 = jax.device_put(rng.integers(0, 256, (64, 224, 224, 3), np.uint8))

    infer = jax.jit(lambda p, u: jax.nn.sigmoid(
        model.apply({"params": p}, val_preprocess(u), deterministic=True)))
    t0 = time.perf_counter()
    sync(infer(params, u8))
    print(f"bf16 compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(30):
        r = infer(params, u8)
    sync(r)
    ms = (time.perf_counter() - t0) / 30 * 1000
    print(f"ViT-L infer b64 bf16: {ms:.1f} ms/batch -> "
          f"{64 / ms * 1000:.0f} img/s/chip", flush=True)

    # int8 static-PTQ path (same calibrate+quant collection bench.py uses)
    from gavit_tpu.serving import calibrate_int8

    qmodel = build_model(cfg.model, precision="int8")
    quant = jax.device_put(calibrate_int8(qmodel, params,
                                          val_preprocess(u8[:8])))
    infer_q = jax.jit(lambda v, u: jax.nn.sigmoid(
        qmodel.apply(v, val_preprocess(u), deterministic=True)))
    variables = {"params": params, **quant}
    t0 = time.perf_counter()
    sync(infer_q(variables, u8))
    print(f"int8 compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(30):
        r = infer_q(variables, u8)
    sync(r)
    ms = (time.perf_counter() - t0) / 30 * 1000
    print(f"ViT-L infer b64 int8: {ms:.1f} ms/batch -> "
          f"{64 / ms * 1000:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
