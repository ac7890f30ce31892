#!/usr/bin/env python
"""Large-N graph branch on the TPU (VERDICT r4 #5 / missing #3).

Times the size-dispatched ``fused_graph_aggregate`` (single-pass kernel
within VMEM; row-chunked XLA past the cliff) at 384px/512px/1024px token
counts, validates the chunked path against the materialised XLA reference
on hardware at N=1025, and times a full graph2 ViT-B forward at 512px.

Run detached: nohup python tools/r5_graph_bigN.py >> logs/r5_graph_bigN.log 2>&1 &
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


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.ops.graph_ops import (
        build_adjacency,
        fused_graph_aggregate,
        graph_aggregate,
        needs_chunked,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    d = 768 if on_tpu else 64
    reps = 20 if on_tpu else 2
    rng = np.random.default_rng(0)
    print(f"graph bigN probe backend={jax.default_backend()} dtype={dtype}",
          flush=True)

    @jax.jit
    def fwd(t, v):
        return fused_graph_aggregate(t, v, "knn", 8)

    @jax.jit
    def fwdbwd(t, v):
        def loss(t, v):
            return jnp.sum(fused_graph_aggregate(t, v, "knn", 8)
                           .astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(t, v)
        return g[0]

    sizes = ((577, 16), (1025, 8), (4097, 2)) if on_tpu else ((65, 2),
                                                             (1025, 1))
    for n, b in sizes:
        t = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
        path = "chunked" if needs_chunked(n, d, t.dtype.itemsize) else "kernel"
        t0 = time.perf_counter()
        sync(fwd(t, v))
        print(f"N={n} b={b} [{path}] fwd compile+1st "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(t, v)
        sync(out)
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"N={n} b={b} [{path}] fwd {ms:.2f} ms/call "
              f"({ms / b * 1000:.0f} us/img)", flush=True)
        t0 = time.perf_counter()
        sync(fwdbwd(t, v))
        print(f"N={n} b={b} [{path}] fwd+bwd compile+1st "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            g = fwdbwd(t, v)
        sync(g)
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"N={n} b={b} [{path}] fwd+bwd {ms:.2f} ms/call", flush=True)

    # hardware parity: chunked vs the materialised XLA reference at N=1025
    n, b = 1025, 2 if on_tpu else 1
    d = 768 if on_tpu else 64
    t = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    @jax.jit
    def ref(t, v):
        return graph_aggregate(build_adjacency(t, mode="knn", k=8), v)

    r = np.asarray(ref(t, v))
    c = np.asarray(jax.jit(
        lambda t, v: fused_graph_aggregate(t, v, "knn", 8))(t, v))
    err = np.abs(r - c).max()
    print(f"N=1025 fp32 chunked-vs-reference max err {err:.2e} "
          f"({'OK' if err < 1e-4 else 'FAIL'})", flush=True)
    # reference (materialised [B,N,N]) timing for the ledger
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ref(t, v)
    sync(out)
    print(f"N=1025 b={b} materialised-XLA fp32 fwd "
          f"{(time.perf_counter() - t0) / reps * 1000:.2f} ms/call",
          flush=True)

    # full flagship-family forward at 512px (N=1025): ViT-B + graph2
    if not on_tpu:
        print("cpu smoke done (model section is TPU-only)", flush=True)
        return
    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params

    cfg = from_dict({
        "model": {"name": "vit_base_16", "img_size": 512, "patch_size": 16,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8, "dynamic": True}},
    })
    precision = "bf16" if on_tpu else "fp32"
    model = build_model(cfg.model, precision=precision)
    params = init_params(model, jax.random.key(0))
    bimg = 8 if on_tpu else 2
    x = jnp.asarray(rng.standard_normal((bimg, 512, 512, 3)), jnp.float32)

    @jax.jit
    def apply(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    t0 = time.perf_counter()
    sync(apply(params, x))
    print(f"512px ViT-B+graph2 b{bimg} compile+1st "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = apply(params, x)
    sync(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"512px ViT-B+graph2 b{bimg} forward {ms:.1f} ms -> "
          f"{bimg / ms * 1000:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
