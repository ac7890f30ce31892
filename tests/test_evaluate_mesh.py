"""Data-sharded evaluation (scripts/evaluate.py): metrics on the 8-device
mesh must equal the single-device result, including ragged tail batches."""

import jax
import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh

from scripts.evaluate import evaluate


def _setup():
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 16, "image_size": 16},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    # 36 % 16 = ragged tail; on the 8-device mesh the tail pads 4 → 8
    ds = SyntheticChestXrayDataset(size=36, image_size=16, seed=3)
    loader = DataLoader(ds, 16, shuffle=False, num_workers=1)
    return cfg, model, params, loader


def test_meshed_eval_matches_single_device(tmp_path):
    cfg, model, params, loader = _setup()
    mesh8 = make_mesh(cfg.mesh)
    assert mesh8.devices.size == 8
    mesh1 = make_mesh(cfg.mesh, devices=jax.devices()[:1])

    r8 = evaluate(model, params, loader, tmp_path / "m8", mesh=mesh8)
    r1 = evaluate(model, params, loader, tmp_path / "m1", mesh=mesh1)
    for key in ("mean_auc", "mean_f1", "exact_match"):
        np.testing.assert_allclose(
            r8["metrics"][key], r1["metrics"][key], atol=2e-6, err_msg=key
        )
    # mesh=None (plain device_put path) agrees too
    r0 = evaluate(model, params, loader, tmp_path / "m0", mesh=None)
    np.testing.assert_allclose(
        r8["metrics"]["mean_auc"], r0["metrics"]["mean_auc"], atol=2e-6
    )


def test_tp_meshed_eval_matches_single_device(tmp_path):
    """A dp×tp evaluation mesh: params Megatron-sharded, fused kernels on
    local heads — metrics equal the single-device result."""
    from gavit_tpu.config import MeshConfig

    cfg, model, params, loader = _setup()
    mesh_tp = make_mesh(MeshConfig(data=4, model=2))
    mesh1 = make_mesh(cfg.mesh, devices=jax.devices()[:1])

    r_tp = evaluate(model, params, loader, tmp_path / "tp", mesh=mesh_tp)
    r1 = evaluate(model, params, loader, tmp_path / "m1", mesh=mesh1)
    for key in ("mean_auc", "mean_f1", "exact_match"):
        np.testing.assert_allclose(
            r_tp["metrics"][key], r1["metrics"][key], atol=2e-6, err_msg=key
        )


def test_sp_meshed_eval_matches_single_device(tmp_path):
    """mesh.sp on the evaluation path: token-sharded residual segments
    under a dp×tp mesh reproduce the single-device metrics."""
    from gavit_tpu.config import MeshConfig

    cfg, model, params, loader = _setup()
    mesh_tp = make_mesh(MeshConfig(data=4, model=2))
    mesh1 = make_mesh(cfg.mesh, devices=jax.devices()[:1])

    r_sp = evaluate(model, params, loader, tmp_path / "sp", mesh=mesh_tp,
                    sp=True)
    r1 = evaluate(model, params, loader, tmp_path / "m1", mesh=mesh1)
    for key in ("mean_auc", "mean_f1", "exact_match"):
        np.testing.assert_allclose(
            r_sp["metrics"][key], r1["metrics"][key], atol=2e-6,
            err_msg=key,
        )


def test_calibration_split_heldout_thresholds(tmp_path):
    """--calibration-frac: operating points fit on a held-out split
    (VERDICT r3 #6) — the JSON carries BOTH batteries, the calibrated
    thresholds come from the disjoint calibration fraction, and the
    reported metrics cover only the eval remainder."""
    cfg, model, params, loader = _setup()
    r = evaluate(model, params, loader, tmp_path / "cal", mesh=None,
                 calibration_frac=0.25)
    cal = r["calibration"]
    assert cal["n_calibration"] == 9 and cal["n_eval"] == 27
    assert set(cal["thresholds"]) <= set(loader.dataset.disease_names)
    assert "metrics_at_calibrated_thresholds" in r
    assert "mean_f1" in r["metrics_at_calibrated_thresholds"]
    # 0.5-threshold battery still present (reference artifact contract)
    assert "mean_auc" in r["metrics"]
    # in-sample Youden keys remain for continuity, still labelled
    assert "in-sample" in r["optimal_thresholds_note"] or \
        "this eval" in r["optimal_thresholds_note"] or \
        "evaluation set" in r["optimal_thresholds_note"]
    # without the flag, no calibration keys appear
    r0 = evaluate(model, params, loader, tmp_path / "nocal", mesh=None)
    assert "calibration" not in r0
