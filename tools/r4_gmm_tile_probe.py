#!/usr/bin/env python
"""Megablox gmm tile sweep at the grouped-MoE production shapes.

The r4 clean bench showed grouped/megablox 4.3x slower than the dense
engine at ViT-B b128 E=8 (1216 vs 284 ms/step) and 2x slower than
ragged_dot — at the default (128,128,128) tiling a single [50432,768] x
[8,768,3072] gmm walks ~58k grid steps, so the kernel is grid-step-bound,
not MXU-bound. This probe times fwd and fwd+bwd for candidate tilings at
the exact per-layer shapes so ops/moe_grouped.py can pick a shape-aware
default.

Run (TPU, detached):
    nohup python tools/r4_gmm_tile_probe.py >> logs/r4_gmm_tiles.log 2>&1 &
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

E, D, F = 8, 768, 3072
TILINGS = [
    (256, 256, 256),
    (256, 768, 768),
    (512, 512, 512),
    (512, 768, 768),
    (512, 768, 1536),
    (1024, 768, 768),
]


def bench(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from jax.experimental.pallas.ops.tpu.megablox.ops import gmm

    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} shapes: E={E} D={D} F={F}")
    for t_rows in (50432, 25216):  # b128 train / b64 infer rows
        sizes = np.full(E, t_rows // E, np.int32)
        sizes[0] += t_rows - sizes.sum()  # exact
        g_sizes = jnp.asarray(sizes)
        x1 = jnp.asarray(rng.randn(t_rows, D), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(E, D, F) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(E, F, D) * 0.05, jnp.bfloat16)

        for tiling in TILINGS:
            # pad rows to the m-tile like ops/moe_grouped.py::ragged_matmul
            # does (pad rows booked to the last group)
            pad = (-t_rows) % tiling[0]
            gp = g_sizes.at[-1].add(pad)
            xp = jnp.pad(x1, ((0, pad), (0, 0)))

            def fwd_pair(x, w1, w2, tiling=tiling, gp=gp):
                h = gmm(x, w1, gp, preferred_element_type=jnp.bfloat16,
                        tiling=tiling)
                return gmm(h, w2, gp,
                           preferred_element_type=jnp.bfloat16, tiling=tiling)

            def loss(x, w1, w2, fwd_pair=fwd_pair):
                return jnp.sum(fwd_pair(x, w1, w2).astype(jnp.float32) ** 2)

            try:
                f = jax.jit(fwd_pair)
                ms_f = bench(f, xp, w1, w2)
                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                ms_b = bench(g, xp, w1, w2)
                print(f"T={t_rows} tiling={tiling}: fwd-pair {ms_f:7.2f} ms"
                      f"  fwd+bwd {ms_b:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep survives one bad tiling
                print(f"T={t_rows} tiling={tiling}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        # ragged_dot comparison point
        def rd_pair(x, w1, w2):
            h = jax.lax.ragged_dot(x, w1, g_sizes,
                                   preferred_element_type=jnp.bfloat16)
            return jax.lax.ragged_dot(h, w2, g_sizes,
                                      preferred_element_type=jnp.bfloat16)

        def rd_loss(x, w1, w2):
            return jnp.sum(rd_pair(x, w1, w2).astype(jnp.float32) ** 2)

        ms_f = bench(jax.jit(rd_pair), x1, w1, w2)
        ms_b = bench(jax.jit(jax.grad(rd_loss, argnums=(0, 1, 2))), x1, w1, w2)
        print(f"T={t_rows} ragged_dot        : fwd-pair {ms_f:7.2f} ms"
              f"  fwd+bwd {ms_b:7.2f} ms", flush=True)
        # dense-slot comparison: the dense engine's expert GEMMs at cf=1.25
        slots = int(t_rows * 1.25) // E
        xd = jnp.asarray(rng.randn(E, slots, D), jnp.bfloat16)

        def dense_pair(xd, w1, w2):
            h = jnp.einsum("ecd,edf->ecf", xd, w1)
            return jnp.einsum("ecf,efd->ecd", h, w2)

        def dense_loss(xd, w1, w2):
            return jnp.sum(dense_pair(xd, w1, w2).astype(jnp.float32) ** 2)

        ms_f = bench(jax.jit(dense_pair), xd, w1, w2)
        ms_b = bench(jax.jit(jax.grad(dense_loss, argnums=(0, 1, 2))), xd, w1, w2)
        print(f"T={t_rows} dense slots (ref) : fwd-pair {ms_f:7.2f} ms"
              f"  fwd+bwd {ms_b:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
