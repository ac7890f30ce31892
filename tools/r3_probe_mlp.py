"""Round-3 TPU probe: fused-MLP megakernel selfcheck + train-step timing.

Runs the REAL kernel path on hardware (CPU CI only exercises the XLA
fallback): (1) forward + all gradients vs an XLA reference armed with the
kernel's own hardware-PRNG mask (extracted via ops/mlp.py::kernel_mask),
proving the fwd/bwd mask streams agree on silicon; (2) times the flagship
ViT-B+graph2 b128 train step at HEAD for the BASELINE.md ledger.

Usage (detached, per CLAUDE.md tunnel discipline):
    JAX_PLATFORMS='' nohup python tools/r3_probe_mlp.py >> logs/r3_mlp.log 2>&1 &
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


def log(msg):
    print(msg, flush=True)


def selfcheck():
    from gavit_tpu.ops import mlp as fm
    from gavit_tpu.ops.dropout import _gelu_f32

    d, f, m, rate = 768, 3072, 2048, 0.1
    bm = fm.pick_block(m, d, f, 2)
    log(f"selfcheck: m={m} bm={bm}")
    assert bm is not None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.01, jnp.bfloat16)
    seed = jnp.asarray([777], jnp.int32)

    mask = np.asarray(fm.kernel_mask(seed, m, f, rate, bm)) > 0.5
    kr = mask.mean()
    assert abs(kr - (1 - rate)) < 0.01, f"mask keep rate {kr:.4f}"
    log(f"kernel mask keep rate {kr:.4f} OK")
    maskj = jnp.asarray(mask)

    def ref(x, w1, b1, w2, b2):
        h1 = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
              + b1).astype(jnp.bfloat16)
        g = _gelu_f32(h1.astype(jnp.float32))
        g = jnp.where(maskj, g / (1 - rate), 0.0)
        return (jnp.dot(g.astype(jnp.bfloat16), w2,
                        preferred_element_type=jnp.float32)
                + b2).astype(jnp.bfloat16)

    y_f = np.asarray(fm.fused_mlp(x, w1, b1, w2, b2, seed, rate),
                     np.float32)
    y_r = np.asarray(ref(x, w1, b1, w2, b2), np.float32)
    err = np.abs(y_f - y_r).max()
    rel = err / max(np.abs(y_r).max(), 1e-6)
    log(f"fwd max abs err {err:.2e} (rel {rel:.2e})")
    assert rel < 2e-2, "forward mismatch vs kernel-mask reference"

    gsum = lambda fn: jax.grad(  # noqa: E731
        lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3, 4),
    )
    gf = gsum(lambda x, w1, b1, w2, b2: fm.fused_mlp(
        x, w1, b1, w2, b2, seed, rate))(x, w1, b1, w2, b2)
    gr = gsum(ref)(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ("x", "w1", "b1", "w2", "b2")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        log(f"grad {name}: rel err {rel:.2e}")
        assert rel < 3e-2, f"grad {name} mismatch (fwd/bwd mask streams?)"
    log("fused MLP kernel selfcheck OK")


def time_step():
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch
    from gavit_tpu.training import Trainer

    img, bs = 224, 128
    cfg = from_dict({
        "model": {"name": "vit_base_16", "img_size": img, "patch_size": 16,
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8, "dynamic": True}},
        "data": {"batch_size": bs, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1, "precision": "bf16"},
    })
    mesh = make_mesh(cfg.mesh)
    model = build_model(cfg.model, precision="bf16")
    params = init_params(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (bs, img, img, 3), np.uint8)
    labels = (rng.random((bs, 14)) < 0.2).astype(np.float32)
    images, labels = shard_batch(mesh, (images, labels))
    ds = SyntheticChestXrayDataset(size=bs, image_size=img)
    loader = DataLoader(ds, bs, num_workers=2)
    tr = Trainer(model, params, loader, loader, cfg, mesh=mesh)

    state = tr.state
    t0 = time.perf_counter()
    state, m, _ = tr._train_step(state, tr.base_rng, images, labels)
    _ = float(m["loss"])
    log(f"compile+1st: {time.perf_counter() - t0:.0f}s")
    for reps in (20, 20):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m, _ = tr._train_step(state, tr.base_rng, images, labels)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        log(f"train step: {dt*1000:.1f} ms → {bs/dt:.0f} img/s/chip")


if __name__ == "__main__":
    log(f"=== r3 mlp probe {time.strftime('%F %T')} backend="
        f"{jax.default_backend()}")
    selfcheck()
    time_step()
    log("probe done")
