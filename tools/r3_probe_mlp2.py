"""Round-3 probe #2: chunked (software-pipelined) fused-MLP kernels.

Selfcheck (mask stream equality across the chunked fwd/bwd on hardware) +
isolated chunk-count sweep + full train-step timing.

Usage: JAX_PLATFORMS='' nohup python tools/r3_probe_mlp2.py >> logs/r3_mlp.log 2>&1 &
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

M, D, F, RATE = 128 * 197, 768, 3072, 0.1


def log(msg):
    print(msg, flush=True)


def data():
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.standard_normal((M, D)) * 0.5, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((D, F)) * 0.03, jnp.bfloat16),
        jnp.asarray(rng.standard_normal(F) * 0.01, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((F, D)) * 0.03, jnp.bfloat16),
        jnp.asarray(rng.standard_normal(D) * 0.01, jnp.bfloat16),
        jnp.asarray([777], jnp.int32),
    )


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:4]))
    return (time.perf_counter() - t0) / reps * 1000


def selfcheck(x, w1, b1, w2, b2, seed):
    from gavit_tpu.ops.dropout import _gelu_f32

    bm = fm.pick_block(M, D, F, 2)
    mask = jnp.asarray(np.asarray(fm.kernel_mask(seed, M, F, RATE, bm)) > 0.5)

    def ref(x, w1, b1, w2, b2):
        h1 = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
              + b1).astype(jnp.bfloat16)
        g = _gelu_f32(h1.astype(jnp.float32))
        g = jnp.where(mask, g / (1 - RATE), 0.0)
        return (jnp.dot(g.astype(jnp.bfloat16), w2,
                        preferred_element_type=jnp.float32)
                + b2).astype(jnp.bfloat16)

    y_f = np.asarray(fm.fused_mlp(x, w1, b1, w2, b2, seed, RATE), np.float32)
    y_r = np.asarray(ref(x, w1, b1, w2, b2), np.float32)
    rel = np.abs(y_f - y_r).max() / max(np.abs(y_r).max(), 1e-6)
    log(f"chunked fwd rel err {rel:.2e}")
    assert rel < 2e-2
    gsum = lambda fn: jax.grad(  # noqa: E731
        lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3, 4))
    gf = gsum(lambda *a: fm.fused_mlp(*a, seed, RATE))(x, w1, b1, w2, b2)
    gr = gsum(ref)(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ("x", "w1", "b1", "w2", "b2")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        log(f"grad {name}: rel {rel:.2e}")
        assert rel < 3e-2, name
    log("chunked selfcheck OK")


def main():
    x, w1, b1, w2, b2, seed = data()
    selfcheck(x, w1, b1, w2, b2, seed)
    for nc in (1, 2, 4, 6):
        os.environ["GAVIT_MLP_FCHUNKS"] = str(nc)
        fwd = jax.jit(lambda *a, _n=nc: fm.fused_mlp(*a, seed, RATE))
        vg = jax.jit(jax.value_and_grad(
            lambda x, w1, b1, w2, b2, _n=nc: jnp.sum(
                fm.fused_mlp(x, w1, b1, w2, b2, seed, RATE)
                .astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4)))
        t_f = timeit(fwd, x, w1, b1, w2, b2)
        t_b = timeit(vg, x, w1, b1, w2, b2)
        log(f"chunks={nc}: fwd {t_f:.2f} ms, fwd+bwd {t_b:.2f} ms")
    os.environ.pop("GAVIT_MLP_FCHUNKS", None)


if __name__ == "__main__":
    log(f"=== r3 mlp probe2 {time.strftime('%F %T')}")
    main()
    log("probe2 done")
