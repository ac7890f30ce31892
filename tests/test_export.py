"""Serving-artifact export (jax.export StableHLO): round-trip parity with
the live Predictor, manifest contract, bucket padding/chunking, CLI."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gavit_tpu.config import from_dict
from gavit_tpu.serving import ExportedPredictor, Predictor, export_serving

CFG = {
    "model": {"name": "custom", "img_size": 16, "patch_size": 8,
              "embed_dim": 32, "depth": 1, "num_heads": 2,
              "num_classes": 14,
              "graph": {"enabled": True, "num_blocks": 1,
                        "adjacency": "knn", "k": 2, "dynamic": True}},
    "data": {"image_size": 16},
}


def test_export_roundtrip_matches_predictor(tmp_path):
    import jax

    cfg = from_dict(CFG)
    pred = Predictor(cfg, None, precision="fp32", buckets=(2, 4))
    params = jax.device_get(pred.params)
    manifest = export_serving(cfg, str(tmp_path / "art"), params=params,
                              precision="fp32", buckets=(2, 4))
    assert manifest["buckets"] == [2, 4]
    assert (tmp_path / "art" / "predict_b2.shlo").exists()
    assert (tmp_path / "art" / "predict_b4.shlo").exists()
    assert (tmp_path / "art" / "weights.npz").exists()

    loaded = ExportedPredictor(str(tmp_path / "art"))
    rng = np.random.default_rng(0)
    # 3 images: pads to bucket 4; 9 images: chunks past the top bucket
    for n in (3, 9):
        imgs = rng.integers(0, 255, (n, 16, 16, 3), np.uint8)
        np.testing.assert_allclose(
            loaded.predict_proba(imgs), pred.predict_proba(imgs), atol=1e-6
        )
    assert loaded.disease_names == pred.disease_names


def test_export_with_tome(tmp_path):
    import jax

    cfg = from_dict(CFG)
    pred = Predictor(cfg, None, precision="fp32", buckets=(4,), tome_r=1)
    params = jax.device_get(pred.params)
    export_serving(cfg, str(tmp_path / "art"), params=params,
                   precision="fp32", buckets=(4,), tome_r=1)
    loaded = ExportedPredictor(str(tmp_path / "art"))
    imgs = np.random.default_rng(1).integers(0, 255, (4, 16, 16, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        loaded.predict_proba(imgs), pred.predict_proba(imgs), atol=1e-6
    )


def test_export_cli(tmp_path):
    import yaml

    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CFG, f)
    out = tmp_path / "artifact"
    env = dict(os.environ, GAVIT_PLATFORM="cpu",
               PYTHONPATH=os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "scripts/export_serving.py",
         "--config", str(cfg_path), "--out", str(out),
         "--precision", "fp32", "--buckets", "2"],
        cwd=str(Path(__file__).resolve().parent.parent),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["format"] == "gavit_tpu.serving_export.v1"
    assert manifest["image_size"] == 16
    loaded = ExportedPredictor(str(out))
    probs = loaded.predict_proba(np.zeros((2, 16, 16, 3), np.uint8))
    assert probs.shape == (2, 14) and np.isfinite(probs).all()


def test_export_int8_roundtrip(tmp_path):
    """int8 export bakes the static-PTQ program (pre-quantised weights +
    calibrated act scales); the artifact reproduces the live int8
    predictor exactly, and export refuses without calibration images."""
    import jax

    cfg = from_dict(CFG)
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)

    pred = Predictor(cfg, None, precision="int8", buckets=(4,))
    pred.calibrate(calib)
    params = jax.device_get(pred.params)

    with pytest.raises(ValueError, match="calibration"):
        export_serving(cfg, str(tmp_path / "bad"), params=params,
                       precision="int8", buckets=(4,))

    manifest = export_serving(cfg, str(tmp_path / "art"), params=params,
                              precision="int8", buckets=(4,),
                              calibration_images=calib)
    # dead fp32 kernels (superseded by w_q) must NOT ship in the artifact
    n_all = len(jax.tree.leaves(pred._variables))
    n_kernels = len([1 for p_, _ in
                     jax.tree_util.tree_flatten_with_path(
                         pred._variables)[0]
                     if getattr(p_[-1], "key", None) == "w_q"])
    assert manifest["n_weights"] == n_all - n_kernels
    loaded = ExportedPredictor(str(tmp_path / "art"))
    imgs = rng.integers(0, 255, (4, 16, 16, 3), np.uint8)
    np.testing.assert_allclose(
        loaded.predict_proba(imgs), pred.predict_proba(imgs), atol=1e-6
    )


def test_serve_from_artifact_http(tmp_path):
    """serve.py --artifact: HTTP serving straight from the exported
    StableHLO + weights (no config / model code), incl. /stats latency."""
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import jax

    from scripts.serve import build_handler

    cfg = from_dict(CFG)
    pred = Predictor(cfg, None, precision="fp32", buckets=(2,))
    params = jax.device_get(pred.params)
    export_serving(cfg, str(tmp_path / "art"), params=params,
                   precision="fp32", buckets=(2,))
    loaded = ExportedPredictor(str(tmp_path / "art"))
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), build_handler(loaded, 16, "artifact"))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        arr = np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3))
        req = urllib.request.Request(
            url + "/predict", data=_json.dumps(arr.tolist()).encode(),
            headers={"Content-Type": "application/json"})
        r = _json.loads(urllib.request.urlopen(req, timeout=300).read())
        np.testing.assert_allclose(
            np.asarray(r["probabilities"]),
            pred.predict_proba(arr.astype(np.uint8)), atol=1e-4)
        stats = _json.loads(
            urllib.request.urlopen(url + "/stats", timeout=60).read())
        assert stats["count"] >= 1
    finally:
        srv.shutdown()


def test_export_bf16_leaves_roundtrip(tmp_path):
    """np.load returns extension dtypes (bf16) as void — the manifest's
    leaf_dtypes restores them, so a bf16-weight artifact replays."""
    import jax
    import jax.numpy as jnp

    cfg = from_dict(CFG)
    pred = Predictor(cfg, None, precision="bf16", buckets=(2,))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                          jax.device_get(pred.params))
    bf16_pred = Predictor(cfg, None, precision="bf16", buckets=(2,),
                          params=params)
    export_serving(cfg, str(tmp_path / "art"), params=params,
                   precision="bf16", buckets=(2,))
    loaded = ExportedPredictor(str(tmp_path / "art"))
    assert any(d == "bfloat16" for d in loaded.manifest["leaf_dtypes"])
    imgs = np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        loaded.predict_proba(imgs), bf16_pred.predict_proba(imgs),
        atol=1e-6)


def test_export_moe_model_roundtrip(tmp_path):
    """A Mixture-of-Experts model exports and replays: the StableHLO
    artifact reproduces the live Predictor on the MoE forward (dense and
    grouped engines both serialize — the r5 fused/grouped paths are
    TPU-gated, so the exported CPU program takes the portable engine; on
    TPU the same export captures the pallas path as custom calls)."""
    import jax

    moe_cfg = {
        "model": {**CFG["model"],
                  "moe": {"enabled": True, "num_experts": 4, "k": 2,
                          "every": 2, "impl": "grouped"}},
        "data": {"image_size": 16},
    }
    cfg = from_dict(moe_cfg)
    pred = Predictor(cfg, None, precision="fp32", buckets=(2,))
    params = jax.device_get(pred.params)
    export_serving(cfg, str(tmp_path / "art"), params=params,
                   precision="fp32", buckets=(2,))
    loaded = ExportedPredictor(str(tmp_path / "art"))
    imgs = np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        loaded.predict_proba(imgs), pred.predict_proba(imgs), atol=1e-6)
