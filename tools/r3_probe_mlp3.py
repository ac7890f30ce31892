"""Round-3 probe #3: out-dropout fold + dx-dtype fix.

Selfcheck of the two-mask stream (out-mask then chunked hidden masks) on
hardware, then the flagship train-step timing.

Usage: JAX_PLATFORMS='' nohup python tools/r3_probe_mlp3.py >> logs/r3_mlp.log 2>&1 &
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
from gavit_tpu.ops.dropout import _gelu_f32


def log(msg):
    print(msg, flush=True)


def selfcheck():
    d, f, m, rate = 768, 3072, 2048, 0.1
    bm = fm.pick_block(m, d, f, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.01, jnp.bfloat16)
    seed = jnp.asarray([777], jnp.int32)

    hm, om = fm.kernel_mask(seed, m, f, rate, bm, d=d, out_rate=rate)
    hm = jnp.asarray(np.asarray(hm) > 0.5)
    om = jnp.asarray(np.asarray(om) > 0.5)
    for name, msk, exp in (("hidden", hm, 1 - rate), ("out", om, 1 - rate)):
        kr = float(jnp.mean(msk.astype(jnp.float32)))
        log(f"{name} mask keep {kr:.4f}")
        assert abs(kr - exp) < 0.01

    def ref(x, w1, b1, w2, b2):
        h1 = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
              + b1).astype(jnp.bfloat16)
        g = _gelu_f32(h1.astype(jnp.float32))
        g = jnp.where(hm, g / (1 - rate), 0.0)
        y = jnp.dot(g.astype(jnp.bfloat16), w2,
                    preferred_element_type=jnp.float32) + b2
        y = jnp.where(om, y / (1 - rate), 0.0)
        return y.astype(jnp.bfloat16)

    y_f = np.asarray(
        fm.fused_mlp(x, w1, b1, w2, b2, seed, rate, rate), np.float32)
    y_r = np.asarray(ref(x, w1, b1, w2, b2), np.float32)
    rel = np.abs(y_f - y_r).max() / max(np.abs(y_r).max(), 1e-6)
    log(f"fwd (two-mask) rel err {rel:.2e}")
    assert rel < 2e-2
    gsum = lambda fn: jax.grad(  # noqa: E731
        lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3, 4))
    gf = gsum(lambda *a: fm.fused_mlp(*a, seed, rate, rate))(x, w1, b1, w2, b2)
    gr = gsum(ref)(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ("x", "w1", "b1", "w2", "b2")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        log(f"grad {name}: rel {rel:.2e}")
        assert rel < 3e-2, name
    log("two-mask selfcheck OK")


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
    log(f"=== r3 mlp probe3 {time.strftime('%F %T')}")
    selfcheck()
    time_step()
    log("probe3 done")
