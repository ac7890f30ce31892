"""Isolated A/B sweep of the fused-MLP kernel at ViT-B b128 shapes:
row-block sizes (GAVIT_MLP_BM override) vs the round-2 unfused chain
(augmented-GEMM fc1/fc2 + fused GELU+dropout kernel).

Usage: JAX_PLATFORMS='' nohup python tools/r3_probe_mlp_sweep.py >> logs/r3_mlp.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()

from gavit_tpu.ops import mlp as fm
from gavit_tpu.ops.dropout import fused_gelu_dropout

M, D, F, RATE = 128 * 197, 768, 3072, 0.1


def log(msg):
    print(msg, flush=True)


def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.01, jnp.bfloat16)
    seed = jnp.asarray([777], jnp.int32)
    return x, w1, b1, w2, b2, seed


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:4]))
    return (time.perf_counter() - t0) / reps * 1000


def old_chain(x, w1, b1, w2, b2, seed):
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    xa = jnp.concatenate([x, ones], axis=-1)
    wk1 = jnp.concatenate([w1, b1[None, :]], axis=0)
    h = jnp.dot(xa, wk1)
    # the real model's site shape: [B, N, F] → per-image grid programs
    g = fused_gelu_dropout(h.reshape(128, 197, F), seed, RATE).reshape(M, F)
    ga = jnp.concatenate([g, ones], axis=-1)
    wk2 = jnp.concatenate([w2, b2[None, :]], axis=0)
    return jnp.dot(ga, wk2)


def main():
    x, w1, b1, w2, b2, seed = data()

    loss_old = jax.jit(jax.value_and_grad(
        lambda x, w1, b1, w2, b2: jnp.sum(
            old_chain(x, w1, b1, w2, b2, seed).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3, 4)))
    fwd_old = jax.jit(lambda *a: old_chain(*a, seed))
    log(f"old chain fwd: {timeit(fwd_old, x, w1, b1, w2, b2):.2f} ms")
    log(f"old chain fwd+bwd: {timeit(loss_old, x, w1, b1, w2, b2):.2f} ms")

    for bm in (64, 128, 256, 512):
        os.environ["GAVIT_MLP_BM"] = str(bm)
        fwd = jax.jit(lambda *a, _bm=bm: fm.fused_mlp(*a, seed, RATE))
        vg = jax.jit(jax.value_and_grad(
            lambda x, w1, b1, w2, b2, _bm=bm: jnp.sum(
                fm.fused_mlp(x, w1, b1, w2, b2, seed, RATE)
                .astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4)))
        try:
            t_f = timeit(fwd, x, w1, b1, w2, b2)
            t_b = timeit(vg, x, w1, b1, w2, b2)
            log(f"fused bm={bm}: fwd {t_f:.2f} ms, fwd+bwd {t_b:.2f} ms")
        except Exception as e:
            log(f"fused bm={bm}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200]}")
    os.environ.pop("GAVIT_MLP_BM", None)


if __name__ == "__main__":
    log(f"=== r3 mlp sweep {time.strftime('%F %T')} backend="
        f"{jax.default_backend()}")
    main()
    log("sweep done")
