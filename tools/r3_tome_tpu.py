#!/usr/bin/env python
"""TPU throughput sweep for token-merging inference (models/tome.py).

Measures ViT-B/16+graph2 @224px bf16 serving throughput at b64 (the
measured v5e sweet spot) for tome_r in {0, 2, 4, 8, 16}, against the
production fused-path `model.apply` baseline, plus the max probability
deviation of each r vs the unmerged forward on the SAME weights/batch.
Deviation on random weights is only a sanity signal — the accuracy story
(learnable-task AUC retention) is measured in tests/test_tome.py — but the
throughput curve is hardware truth.

Device-resident inputs + scalar-fetch sync (the tunnel does not honour
block_until_ready); appends a summary line per point to stdout.

Run detached: nohup python tools/r3_tome_tpu.py > logs/r3_tome_tpu.log 2>&1 &
"""

from __future__ import annotations

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
    from gavit_tpu.config import from_dict
    from gavit_tpu.models.tome import tome_forward_fn
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.ops.preprocess import val_preprocess

    on_tpu = jax.default_backend() == "tpu"
    img = 224 if on_tpu else 64
    batch = 64 if on_tpu else 8
    name = "vit_base_16" if on_tpu else "vit_tiny_16"
    n_iter = 20 if on_tpu else 3

    cfg = from_dict({
        "model": {
            "name": name, "img_size": img, "patch_size": 16,
            "num_classes": 14,
            "graph": {"enabled": True, "num_blocks": 2, "adjacency": "knn",
                      "k": 8, "dynamic": True},
        },
        "data": {"batch_size": batch, "image_size": img},
    })
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_model(cfg.model, precision="bf16" if on_tpu else "fp32")
    params = init_params(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    u8 = jax.device_put(rng.integers(0, 256, (batch, img, img, 3), np.uint8))

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32).ravel()[:4]))

    # params/variables always ride as jit ARGUMENTS: a closure would bake
    # them into the program as constants, and the axon relay's
    # remote-compile endpoint rejects the ~350 MB request (HTTP 413)
    def bench(fn, variables, label):
        t0 = time.perf_counter()
        probs = fn(variables, u8)
        sync(probs)
        print(f"{label}: compile+1st {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            probs = fn(variables, u8)
        sync(probs)
        dt = (time.perf_counter() - t0) / n_iter
        ips = batch / dt
        print(f"{label}: {dt * 1000:.2f} ms/batch -> {ips:.0f} img/s",
              flush=True)
        return ips, np.asarray(probs, np.float32)

    base = jax.jit(lambda p, u: jax.nn.sigmoid(
        model.apply({"params": p}, val_preprocess(u), deterministic=True)))
    ips0, p_base = bench(base, params, "model.apply (production fused path)")

    results = [("apply", ips0, 0.0)]
    for r in (0, 2, 4, 8, 16):
        fwd = tome_forward_fn(cfg.model, r, dtype=dtype)
        fn = jax.jit(lambda p, u, fwd=fwd: jax.nn.sigmoid(
            fwd(p, val_preprocess(u))))
        ips, p = bench(fn, params, f"tome r={r}")
        dev = float(np.abs(p - p_base).max())
        print(f"tome r={r}: {ips:.0f} img/s ({ips / ips0:.2f}x), "
              f"max prob dev {dev:.4f}", flush=True)
        results.append((f"r={r}", ips, dev))

    # ---- static-int8 x tome composition ---------------------------------
    from gavit_tpu.models.tome import tome_forward
    from gavit_tpu.serving import calibrate_int8

    qmodel = build_model(cfg.model, precision="int8")
    quant = jax.device_put(
        calibrate_int8(qmodel, params, val_preprocess(u8[:8])))
    variables = {"params": params, **quant}
    int8_fn = jax.jit(lambda v, u: jax.nn.sigmoid(
        qmodel.apply(v, val_preprocess(u), deterministic=True)))
    ips_q0, p_q = bench(int8_fn, variables, "int8 apply")
    results.append(("int8", ips_q0, float(np.abs(p_q - p_base).max())))
    for r in (8, 16):
        fn = jax.jit(lambda v, u, r=r: jax.nn.sigmoid(tome_forward(
            cfg.model, v["params"], val_preprocess(u), r,
            dtype=jnp.bfloat16, quant=v["quant"])))
        ips, p = bench(fn, variables, f"int8+tome r={r}")
        dev = float(np.abs(p - p_base).max())
        print(f"int8+tome r={r}: {ips:.0f} img/s ({ips / ips0:.2f}x), "
              f"max prob dev {dev:.4f}", flush=True)
        results.append((f"i8r={r}", ips, dev))

    print("\nsummary (img/s @ b64, vs bf16 apply, max prob dev):", flush=True)
    for label, ips, dev in results:
        print(f"  {label:>7}: {ips:7.0f}  {ips / ips0:5.2f}x  dev {dev:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
