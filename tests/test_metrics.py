"""MetricCalculator vs direct sklearn computation, incl. the degenerate-class
case the reference crashes on (``metrics.py:53-57`` KeyError — SURVEY §0.5)."""

import numpy as np
from sklearn.metrics import average_precision_score, f1_score, roc_auc_score

from gavit_tpu.data.dataset import DISEASE_NAMES
from gavit_tpu.utils.metrics import MetricCalculator


def _data(n=200, seed=0):
    rng = np.random.default_rng(seed)
    targets = (rng.random((n, 14)) < 0.3).astype(np.float64)
    predictions = np.clip(
        targets * 0.4 + rng.random((n, 14)) * 0.6, 0, 1
    )
    return targets, predictions


def test_per_class_metrics_match_sklearn():
    targets, predictions = _data()
    mc = MetricCalculator(DISEASE_NAMES)
    m = mc.calculate_metrics(targets, predictions)
    binary = (predictions > 0.5).astype(float)
    for i, d in enumerate(DISEASE_NAMES):
        assert abs(m[f"{d}_auc"] - roc_auc_score(targets[:, i],
                                                 predictions[:, i])) < 1e-9
        assert abs(m[f"{d}_ap"] - average_precision_score(
            targets[:, i], predictions[:, i])) < 1e-9
        assert abs(m[f"{d}_f1"] - f1_score(targets[:, i], binary[:, i])) < 1e-9


def test_mean_metrics_and_exact_match():
    targets, predictions = _data(seed=1)
    mc = MetricCalculator(DISEASE_NAMES)
    m = mc.calculate_metrics(targets, predictions)
    aucs = [m[f"{d}_auc"] for d in DISEASE_NAMES]
    assert abs(m["mean_auc"] - np.mean(aucs)) < 1e-12
    binary = (predictions > 0.5).astype(float)
    assert abs(m["exact_match"]
               - np.mean(np.all(binary == targets, axis=1))) < 1e-12


def test_degenerate_class_does_not_crash():
    """Single-valued class → skipped per class AND excluded from means
    (the reference KeyErrors here)."""
    targets, predictions = _data(seed=2)
    targets[:, 3] = 0.0  # no positives for disease 3
    mc = MetricCalculator(DISEASE_NAMES)
    m = mc.calculate_metrics(targets, predictions)
    assert f"{DISEASE_NAMES[3]}_auc" not in m
    assert np.isfinite(m["mean_auc"])


def test_bootstrap_confidence_intervals():
    targets, predictions = _data(seed=3)
    mc = MetricCalculator(DISEASE_NAMES)
    ci = mc.calculate_confidence_intervals(
        targets, predictions, n_bootstrap=20, seed=0
    )
    m = mc.calculate_metrics(targets, predictions)
    lo, hi = ci["mean_auc_ci"]
    assert lo <= m["mean_auc"] <= hi
    assert lo < hi


def test_plot_metrics_writes_artifacts(tmp_path):
    targets, predictions = _data(seed=4)
    mc = MetricCalculator(DISEASE_NAMES)
    m = mc.calculate_metrics(targets, predictions)
    m["loss"] = 0.5
    mc.plot_metrics([m, m], tmp_path)
    assert (tmp_path / "loss_curve.png").exists()
    assert (tmp_path / "auc_curves.png").exists()
