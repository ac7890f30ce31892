"""Grad-CAM, attention capture/rollout, and visualization artifacts."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.data.dataset import DISEASE_NAMES
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.utils.gradcam import (
    VisionTransformerGradCAM,
    attention_rollout,
    overlay_cam,
)
from gavit_tpu.utils.visualization import VisualizationManager


def _setup(img=32, patch=8):
    cfg = from_dict({"model": {
        "name": "custom", "img_size": img, "patch_size": patch,
        "embed_dim": 32, "depth": 2, "num_heads": 2, "num_classes": 14,
        "drop_rate": 0.0,
    }})
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, img, img, 3))
    return model, params, x


def test_capture_tokens_shapes():
    model, params, x = _setup()
    logits, toks = model.apply({"params": params}, x, deterministic=True,
                               capture="tokens")
    assert len(toks) == 2
    assert toks[0].shape == (2, 17, 32)  # 16 patches + CLS


def test_capture_attention_shapes_and_stochasticity():
    model, params, x = _setup()
    logits, attns = model.apply({"params": params}, x, deterministic=True,
                                capture="attention")
    assert len(attns) == 2
    assert attns[0].shape == (2, 2, 17, 17)
    np.testing.assert_allclose(np.asarray(attns[0]).sum(-1), 1.0, atol=1e-5)


def test_capture_does_not_change_logits():
    model, params, x = _setup()
    base = model.apply({"params": params}, x, deterministic=True)
    with_tok, _ = model.apply({"params": params}, x, deterministic=True,
                              capture="tokens")
    with_attn, _ = model.apply({"params": params}, x, deterministic=True,
                               capture="attention")
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_tok),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_attn),
                               atol=1e-4)  # reference-attn numerics


def test_token_probe_gradient_matches_manual_jacobian():
    """Probe gradient == true token gradient: verified against a directional
    finite difference through the token stream."""
    model, params, x = _setup()

    def f(probe):
        logits, _ = model.apply({"params": params}, x, deterministic=True,
                                capture="tokens", token_probe=(1, probe))
        return jnp.sum(logits[:, 3])

    probe = jnp.zeros((2, 17, 32))
    g = jax.grad(f)(probe)
    assert g.shape == probe.shape
    assert np.abs(np.asarray(g)).max() > 0
    # directional finite difference
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(probe.shape), jnp.float32)
    eps = 1e-3
    fd = (f(eps * v) - f(-eps * v)) / (2 * eps)
    analytic = jnp.sum(g * v)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2)


def test_gradcam_output_range_and_shape():
    model, params, x = _setup()
    gc = VisionTransformerGradCAM(model, params)
    cams, probs = gc(x, class_idx=0)
    assert cams.shape == (2, 4, 4)  # 32/8 = 4x4 patch grid
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    assert probs.shape == (2, 14)


def test_attention_rollout():
    model, params, x = _setup()
    maps, logits = attention_rollout(model, params, x)
    assert maps.shape == (2, 4, 4)
    assert maps.min() >= 0.0 and maps.max() <= 1.0


def test_overlay_cam():
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    cam = np.random.default_rng(1).random((4, 4)).astype(np.float32)
    out = overlay_cam(img, cam)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_visualization_manager_artifacts(tmp_path):
    model, params, x = _setup()
    rng = np.random.default_rng(0)
    targets = (rng.random((20, 14)) < 0.4).astype(np.float64)
    preds = np.clip(targets * 0.5 + rng.random((20, 14)) * 0.5, 0, 1)
    viz = VisualizationManager(tmp_path, DISEASE_NAMES)
    # the reference's artifact directory layout (visualization.py:20-31)
    for sub in ("roc_curves", "pr_curves", "confusion_matrices",
                "attention_maps", "error_analysis", "training_progress"):
        assert (tmp_path / sub).is_dir()
    roc = viz.plot_roc_curves(targets, preds)
    assert roc.exists() and roc.parent.name == "roc_curves"
    pr = viz.plot_pr_curves(targets, preds)
    assert pr.exists() and pr.parent.name == "pr_curves"
    cm = viz.plot_confusion_matrices(targets, preds)
    assert cm.exists() and cm.parent.name == "confusion_matrices"
    err = viz.plot_error_analysis(targets, preds)
    assert err.exists() and err.parent.name == "error_analysis"
    hist = [{"loss": 1.0, "mean_auc": 0.5, "mean_ap": 0.3, "mean_f1": 0.2},
            {"loss": 0.8, "mean_auc": 0.6, "mean_ap": 0.4, "mean_f1": 0.3}]
    prog = viz.plot_training_progress(hist, hist)
    assert prog.exists() and prog.parent.name == "training_progress"
    # the reference's per-metric progress plots (visualization.py:153-167)
    for m in ("loss", "auc", "ap", "f1"):
        assert (tmp_path / "training_progress" / f"{m}_progress.pdf").exists()
    from gavit_tpu.training.schedule import warmup_cosine_schedule

    lr = viz.plot_learning_rate(warmup_cosine_schedule(1e-4, 10, 100), 100)
    assert lr.exists() and lr.parent.name == "training_progress"
    metrics = {"mean_auc": 0.5}
    for d in DISEASE_NAMES:
        for c in ("auc", "ap", "f1", "sensitivity", "specificity", "precision"):
            metrics[f"{d}_{c}"] = 0.5
        metrics.update({f"mean_{c}": 0.5 for c in
                        ("auc", "ap", "f1", "sensitivity", "specificity",
                         "precision")})
    csv_path, tex_path = viz.save_performance_tables(metrics)
    assert csv_path.exists() and tex_path.exists()
    # CI column (reference visualization.py:225-228)
    ci = {f"{d}_auc_ci": (0.41, 0.62) for d in DISEASE_NAMES}
    ci["mean_auc_ci"] = (0.45, 0.58)
    csv_ci, _ = viz.save_performance_tables(metrics, basename="perf_ci",
                                            ci_metrics=ci)
    text = csv_ci.read_text()
    assert "AUC-ROC CI" in text and "(0.410-0.620)" in text
    images_u8 = rng.integers(0, 255, (4, 32, 32, 3), np.uint8)
    assert viz.plot_prediction_grid(images_u8, targets[:4], preds[:4]).exists()
    imgs_n = np.asarray(x)
    assert viz.plot_attention_maps(model, params, imgs_n,
                                   images_u8[:2]).exists()
    assert viz.plot_gradcam(model, params, imgs_n, images_u8[:2], 0).exists()
    # per-layer raw attention heatmaps: one artifact per block
    # (reference visualization.py:98-130)
    layer_paths = viz.plot_per_layer_attention(model, params, imgs_n[:1])
    assert len(layer_paths) == model.cfg.depth
    assert all(p.exists() for p in layer_paths)
