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


def test_static_int8_calibration_matches_fp32():
    """Static PTQ (pre-quantised weights + calibrated per-tensor activation
    scales): logits stay within the PTQ envelope of fp32, and the quant
    collection replaces every per-call absmax pass."""
    from gavit_tpu.serving import calibrate_int8

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 32, "patch_size": 8, "embed_dim": 64,
        "depth": 2, "num_heads": 2, "num_classes": 14,
        "graph": {"enabled": True, "num_blocks": 1, "adjacency": "knn",
                  "k": 3},
    }})
    model = build_model(cfg.model, precision="fp32")
    model_q = build_model(cfg.model, precision="int8")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))

    quant = calibrate_int8(model_q, params, x)
    # every QDense/HeadMergeProj site carries pre-quantised weights + scales
    leaves = jax.tree.leaves(quant["quant"])
    assert any(l.dtype == jnp.int8 for l in leaves)
    q_tree = quant["quant"]
    assert set(q_tree["head"].keys()) == {"w_q", "w_scale", "act_scale"}

    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))
    out = np.asarray(model_q.apply(
        {"params": params, **quant}, x, deterministic=True
    ))
    rel = np.abs(ref - out).max() / np.abs(ref).max()
    assert rel < 0.08, f"static int8 logit deviation {rel:.3f}"


def test_int8_predictor_calibrated():
    from gavit_tpu.serving import Predictor

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }, "data": {"image_size": 16}})
    p = Predictor(cfg, precision="int8", buckets=(1, 4))
    rng = np.random.default_rng(0)
    p.calibrate(rng.integers(0, 255, (4, 16, 16, 3), np.uint8))
    assert "quant" in p._variables
    probs = p.predict_proba(rng.integers(0, 255, (3, 16, 16, 3), np.uint8))
    assert probs.shape == (3, 14) and np.isfinite(probs).all()
    # warmup keeps the calibrated scales (no re-calibration on noise)
    before = p._variables["quant"]
    p.warmup()
    assert p._variables["quant"] is before
