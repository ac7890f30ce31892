#!/usr/bin/env python
"""Pipeline stage bodies with the DEFAULT (Pallas) impls, lowered on real
TPU hardware.

Multi-chip pp cannot run on this 1-chip host, but the load-bearing risk of
lifting the r3 ``attn_impl/mlp_impl='xla'`` pin is whether Mosaic kernels
lower and execute INSIDE the manual shard_map region at all — that is
testable on a 1-stage ('pipe','data') mesh over the single chip. Runs a
full pipelined fwd+bwd (dropout on → fused attention/MLP/dropout kernels
engaged) and checks the logits against the sequential model.

Run detached: nohup python tools/r5_pp_tpu_smoke.py >> logs/r5_pp_smoke.log 2>&1 &
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
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.pp import make_pipe_mesh, pipeline_apply

    on_tpu = jax.default_backend() == "tpu"
    cfg = from_dict({
        "model": {"name": "vit_base_16" if on_tpu else "custom",
                  "img_size": 224 if on_tpu else 32,
                  "patch_size": 16 if on_tpu else 8,
                  **({} if on_tpu else {"embed_dim": 64, "depth": 2,
                                        "num_heads": 2}),
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8 if on_tpu else 3,
                            "dynamic": True}},
    })
    precision = "bf16" if on_tpu else "fp32"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_model(cfg.model, precision=precision)
    params = init_params(model, jax.random.key(0))
    mesh = make_pipe_mesh(1, data=1)
    b = 32 if on_tpu else 4
    img = cfg.model.img_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, img, img, 3)), jnp.float32)
    print(f"pp smoke backend={jax.default_backend()} S=1 b={b}", flush=True)

    @jax.jit
    def pipe_fwd(p, x):
        return pipeline_apply(mesh, cfg.model, p, x, num_microbatches=4,
                              dtype=dtype)

    @jax.jit
    def pipe_loss_grad(p, x, key):
        def loss(p):
            logits = pipeline_apply(mesh, cfg.model, p, x,
                                    num_microbatches=4, dtype=dtype,
                                    deterministic=False, rng=key)
            return jnp.mean(logits ** 2)

        return jax.value_and_grad(loss)(p)

    t0 = time.perf_counter()
    out = pipe_fwd(params, x)
    ref = model.apply({"params": params}, x, deterministic=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"pp fwd (default impls, in-shard_map) compile+run "
          f"{time.perf_counter() - t0:.0f}s, |Δlogit| vs sequential "
          f"{err:.2e} ({'OK' if err < (2e-2 if on_tpu else 1e-4) else 'FAIL'})",
          flush=True)

    t0 = time.perf_counter()
    val, grads = pipe_loss_grad(params, x, jax.random.key(1))
    gn = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
             for g in jax.tree.leaves(grads))
    print(f"pp fwd+bwd with dropout (fused kernels) compile+run "
          f"{time.perf_counter() - t0:.0f}s, loss {float(val):.4f}, "
          f"grad sumsq finite={np.isfinite(gn)}", flush=True)

    # late r5: drop_path under pp — the traced per-layer rates ride the
    # layer scan; fwd+bwd through the bernoulli/scale on hardware
    import dataclasses

    dcfg = dataclasses.replace(cfg.model, drop_path_rate=0.1)

    @jax.jit
    def pipe_dp(p, x, key):
        def loss(p):
            logits = pipeline_apply(mesh, dcfg, p, x, num_microbatches=4,
                                    dtype=dtype, deterministic=False,
                                    rng=key)
            return jnp.mean(logits ** 2)

        return jax.value_and_grad(loss)(p)

    t0 = time.perf_counter()
    val, grads = pipe_dp(params, x, jax.random.key(2))
    gn = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
             for g in jax.tree.leaves(grads))
    print(f"pp fwd+bwd with drop_path=0.1 (traced per-layer rates) "
          f"compile+run {time.perf_counter() - t0:.0f}s, loss "
          f"{float(val):.4f}, grad sumsq finite={np.isfinite(gn)}",
          flush=True)

    # late r5: QAT under pp — act scales threaded through the scan; the
    # fake-quantised GEMMs must match the sequential qat model exactly
    from gavit_tpu.serving import calibrate_act_scales

    qmodel = build_model(cfg.model, precision=precision, qat=True)
    t0 = time.perf_counter()
    quant = calibrate_act_scales(qmodel, params, x[:8])

    @jax.jit
    def pipe_q(p, x):
        return pipeline_apply(mesh, cfg.model, p, x, num_microbatches=4,
                              dtype=dtype, quant=quant["quant"])

    qout = pipe_q(params, x)
    qref = qmodel.apply({"params": params, **quant}, x, deterministic=True)
    qerr = float(jnp.max(jnp.abs(qout.astype(jnp.float32)
                                 - qref.astype(jnp.float32))))
    print(f"pp qat fwd (fake-quant GEMMs in-shard_map) compile+run "
          f"{time.perf_counter() - t0:.0f}s, |Δlogit| vs sequential qat "
          f"{qerr:.2e} "
          f"({'OK' if qerr < (2e-2 if on_tpu else 1e-4) else 'FAIL'})",
          flush=True)


if __name__ == "__main__" and os.environ.get("PP_TIMING") != "1":
    main()


def timing_main():
    """pp=1 machinery overhead vs the sequential model (fwd+bwd, TPU):
    quantifies the shard_map + tick-scan + ppermute tax the multi-stage
    bubble analysis sits on top of (VERDICT r4 weak #5's measurable part
    on one chip)."""
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.pp import make_pipe_mesh, pipeline_apply

    on_tpu = jax.default_backend() == "tpu"
    cfg = from_dict({
        "model": {"name": "vit_base_16" if on_tpu else "custom",
                  "img_size": 224 if on_tpu else 32,
                  "patch_size": 16 if on_tpu else 8,
                  **({} if on_tpu else {"embed_dim": 64, "depth": 2,
                                        "num_heads": 2}),
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8 if on_tpu else 3,
                            "dynamic": True}},
    })
    precision = "bf16" if on_tpu else "fp32"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_model(cfg.model, precision=precision)
    params = init_params(model, jax.random.key(0))
    mesh = make_pipe_mesh(1, data=1)
    b = 32 if on_tpu else 4
    img = cfg.model.img_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, img, img, 3)), jnp.float32)
    key = jax.random.key(1)
    reps = 20 if on_tpu else 2
    m = int(os.environ.get("PP_TIMING_M", "4"))

    @jax.jit
    def pipe_g(p, x, key):
        def loss(p):
            return jnp.mean(pipeline_apply(
                mesh, cfg.model, p, x, num_microbatches=m, dtype=dtype,
                deterministic=False, rng=key) ** 2)

        return jax.grad(loss)(p)

    @jax.jit
    def seq_g(p, x, key):
        def loss(p):
            return jnp.mean(model.apply(
                {"params": p}, x, deterministic=False,
                rngs={"dropout": key}) ** 2)

        return jax.grad(loss)(p)

    for name, fn in (("sequential", seq_g), (f"pp1-M{m}", pipe_g)):
        g = fn(params, x, key)
        _ = float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(reps):
            g = fn(params, x, key)
        _ = float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"[pp-overhead] {name} fwd+bwd b{b}: {ms:.1f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("PP_TIMING") == "1":
    timing_main()
