#!/usr/bin/env python
"""Round-4 probe: is int8 MXU (394 TOPS on v5e, 2x bf16) reachable for the
TRAINING hot GEMMs through this toolchain?

Measures, at the ViT-B b128 MLP shapes (m=25216, d=768, f=3072):
  1. raw XLA GEMM rate: bf16 vs int8 (pre-quantized operands, int32 accum)
  2. the fused-MLP megakernel (bf16, fwd) vs an int8 twin that quantizes
     the activation block per-row IN VMEM (no HBM quant round-trip — the
     pass that made dynamic int8 inference lose, ops/quant.py) and runs
     both GEMMs int8xint8->int32 against VMEM-resident int8 weights.

Background: static-PTQ int8 serving already wins +32% (BASELINE.md); the
question is whether a *training-step* int8 forward can win despite per-step
weight quantization and in-kernel activation quantization overhead.

Run detached (CLAUDE.md: one long-lived TPU process):
  cd /root/repo && PYTHONPATH=/root/.axon_site:/root/repo \
    nohup python tools/r4_int8_probe.py > logs/r4_int8_probe.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32).ravel()[:8]))


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


M, D, F = 25216, 768, 3072
BM = 64


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.device_count()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.03, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.03, jnp.bfloat16)
    b1 = jnp.zeros((F,), jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)

    # ---- 1. raw XLA GEMM: bf16 vs int8 -----------------------------------
    @jax.jit
    def gemm_bf16(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.01), -127, 127
                  ).astype(jnp.int8)
    w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) / 0.001), -127, 127
                   ).astype(jnp.int8)

    @jax.jit
    def gemm_int8(xq, wq):
        return jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    t_bf16 = timeit(gemm_bf16, x, w1)
    t_int8 = timeit(gemm_int8, xq, w1q)
    gflop = 2 * M * D * F / 1e9
    log(f"[1] XLA GEMM {M}x{D}x{F}: bf16 {t_bf16:.3f} ms "
        f"({gflop/t_bf16:.0f} TFLOPS) | int8 {t_int8:.3f} ms "
        f"({gflop/t_int8:.0f} TOPS) | speedup {t_bf16/t_int8:.2f}x")

    # int8 with the dequant epilogue fused (what a real layer needs)
    sx = jnp.ones((M, 1), jnp.float32) * 0.01
    sw = jnp.ones((1, F), jnp.float32) * 0.001

    @jax.jit
    def gemm_int8_deq(xq, wq, sx, sw):
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    t_int8d = timeit(gemm_int8_deq, xq, w1q, sx, sw)
    log(f"[1b] int8 GEMM + dequant epilogue: {t_int8d:.3f} ms "
        f"(speedup vs bf16 {t_bf16/t_int8d:.2f}x)")

    # ---- 2. fused-MLP fwd: bf16 kernel vs int8 twin -----------------------
    from gavit_tpu.ops import mlp as fm

    seed = jnp.asarray([0], jnp.int32)
    t_fused_bf16 = timeit(
        jax.jit(lambda x: fm._run_fwd(x, w1, b1.reshape(1, -1), w2,
                                      b2.reshape(1, -1), seed, 0.0, 0.0, BM)),
        x)
    log(f"[2] fused-MLP fwd bf16 (bm={BM}): {t_fused_bf16:.3f} ms")

    # int8 twin: weights pre-quantized per call (per-column scales), the
    # activation block quantized per-row in VMEM, both dots int8.
    def qcols(w):  # [K,N] -> int8 [K,N], scales [1,N]
        a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0
        return jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                        ).astype(jnp.int8), s

    def int8_mlp_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, y_ref):
        xf = x_ref[...].astype(jnp.float32)
        ax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sxr = jnp.maximum(ax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sxr), -127, 127).astype(jnp.int8)
        acc1 = jax.lax.dot_general(
            xq, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc1.astype(jnp.float32) * sxr * s1_ref[...]
        g = jax.nn.gelu(h, approximate=False)
        ag = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        sgr = jnp.maximum(ag, 1e-8) / 127.0
        gq = jnp.clip(jnp.round(g / sgr), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            gq, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y_ref[...] = (acc2.astype(jnp.float32) * sgr * s2_ref[...]
                      ).astype(y_ref.dtype)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def row_spec(bm, cols):
        return pl.BlockSpec((bm, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def int8_mlp(x, w1q, s1, w2q, s2):
        return pl.pallas_call(
            int8_mlp_kernel,
            grid=(M // BM,),
            in_specs=[row_spec(BM, D), const_spec((D, F)), const_spec((1, F)),
                      const_spec((F, D)), const_spec((1, D))],
            out_specs=row_spec(BM, D),
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * M * D * F,
                bytes_accessed=(2 * M * D * 2 + (D * F + F * D)),
                transcendentals=M * F,
            ),
        )(x, w1q, s1, w2q, s2)

    w1q8, s1 = qcols(w1)
    w2q8, s2 = qcols(w2)
    try:
        t_fused_int8 = timeit(int8_mlp, x, w1q8, s1, w2q8, s2)
        log(f"[2b] fused-MLP fwd int8 (bm={BM}): {t_fused_int8:.3f} ms "
            f"(speedup vs bf16 kernel {t_fused_bf16/t_fused_int8:.2f}x)")
        # numeric sanity vs bf16 chain
        y8 = int8_mlp(x, w1q8, s1, w2q8, s2)
        yref = fm._chain_infer(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                               False)
        err = float(jnp.max(jnp.abs(y8.astype(jnp.float32)
                                    - yref.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(yref.astype(jnp.float32))))
        log(f"[2c] int8 kernel max abs err vs bf16 chain: {err:.4f} "
            f"(ref max {ref:.3f}, rel {err/max(ref,1e-9):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"[2b] int8 pallas kernel FAILED: {type(e).__name__}: {e}")

    # ---- 3. larger block for int8 (32x128 tiles want bigger bm) ----------
    # only block sizes that divide M: a truncating grid (M // bm rows) would
    # time LESS work than the other rows of the sweep and leave the output
    # tail unwritten
    for bm in (b for b in (128, 256) if M % b == 0):
        @jax.jit
        def int8_mlp_b(x, w1q, s1, w2q, s2, bm=bm):
            return pl.pallas_call(
                int8_mlp_kernel,
                grid=(M // bm,),
                in_specs=[row_spec(bm, D), const_spec((D, F)),
                          const_spec((1, F)), const_spec((F, D)),
                          const_spec((1, D))],
                out_specs=row_spec(bm, D),
                out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * M * D * F,
                    bytes_accessed=(2 * M * D * 2 + (D * F + F * D)),
                    transcendentals=M * F,
                ),
            )(x, w1q, s1, w2q, s2)
        try:
            t = timeit(int8_mlp_b, x, w1q8, s1, w2q8, s2)
            log(f"[3] fused-MLP fwd int8 bm={bm}: {t:.3f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"[3] int8 bm={bm} FAILED: {type(e).__name__}: {e}")

    # ---- 4. per-step weight quantization cost (XLA, hoistable?) ----------
    @jax.jit
    def quant_weights(w1, w2):
        return qcols(w1), qcols(w2)

    t_q = timeit(quant_weights, w1, w2)
    log(f"[4] per-step weight quant (both mats, XLA): {t_q:.3f} ms")

    log("probe done")


if __name__ == "__main__":
    main()
