"""Int8 dynamic-quantised inference path (serving PTQ)."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.ops.quant import int8_matmul, quantize_rowwise


def test_quantize_roundtrip_error():
    x = jax.random.normal(jax.random.key(0), (16, 64))
    q, s = quantize_rowwise(x)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # absmax int8: error bounded by scale/2 per element
    assert err.max() <= float(np.asarray(s).max()) * 0.51
    assert q.dtype == jnp.int8


def test_int8_matmul_close_to_fp32():
    a = jax.random.normal(jax.random.key(1), (32, 128))
    w = jax.random.normal(jax.random.key(2), (128, 64)) * 0.05
    exact = np.asarray(a @ w)
    approx = np.asarray(int8_matmul(a, w))
    denom = np.abs(exact).max()
    assert np.abs(approx - exact).max() / denom < 0.02


def test_int8_model_logits_close():
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 32, "patch_size": 8, "embed_dim": 64,
        "depth": 2, "num_heads": 2, "num_classes": 14,
        "graph": {"enabled": True, "num_blocks": 1, "adjacency": "knn",
                  "k": 3},
    }})
    model = build_model(cfg.model, precision="fp32")
    model_q = build_model(cfg.model, precision="int8")
    params = init_params(model, jax.random.key(0))  # same tree both ways
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))
    q = np.asarray(model_q.apply({"params": params}, x, deterministic=True))
    rel = np.abs(ref - q).max() / np.abs(ref).max()
    assert rel < 0.05, f"int8 logit deviation {rel:.3f}"


def test_int8_predictor():
    from gavit_tpu.serving import Predictor

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }, "data": {"image_size": 16}})
    p = Predictor(cfg, precision="int8", buckets=(1, 4))
    imgs = np.random.default_rng(0).integers(0, 255, (3, 16, 16, 3), np.uint8)
    probs = p.predict_proba(imgs)
    assert probs.shape == (3, 14)
    assert np.isfinite(probs).all()
