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


def test_optimal_thresholds_youden():
    """Separable scores: the Youden-J threshold lands in the separating gap
    and beats the 0.5 battery on sensitivity+specificity; per-disease
    vector thresholds thread through calculate_metrics."""
    import numpy as np

    from gavit_tpu.utils.metrics import MetricCalculator

    rng = np.random.default_rng(0)
    n = 400
    targets = np.zeros((n, 2), np.float32)
    targets[:, 0] = (rng.random(n) < 0.1)          # rare disease
    targets[:, 1] = (rng.random(n) < 0.5)
    preds = np.zeros((n, 2), np.float32)
    # disease 0: perfectly separable around 0.2 (a 0.5 threshold scores
    # ZERO sensitivity); disease 1: separable around 0.6
    preds[:, 0] = np.where(targets[:, 0] > 0, 0.3, 0.1)
    preds[:, 1] = np.where(targets[:, 1] > 0, 0.7, 0.5)
    mc = MetricCalculator(["rare", "common"])
    thr = mc.optimal_thresholds(targets, preds)
    assert 0.1 < thr["rare"] <= 0.3
    assert 0.5 < thr["common"] <= 0.7

    at_half = mc.calculate_metrics(targets, preds, threshold=0.5)
    assert at_half["rare_sensitivity"] == 0.0  # the defect being fixed
    at_opt = mc.calculate_metrics(
        targets, preds, threshold=np.asarray([thr["rare"], thr["common"]]))
    assert at_opt["rare_sensitivity"] == 1.0
    assert at_opt["rare_specificity"] == 1.0
    assert at_opt["mean_f1"] >= at_half["mean_f1"]

    # single-valued class is skipped, not crashed
    targets[:, 0] = 0
    thr2 = mc.optimal_thresholds(targets, preds)
    assert "rare" not in thr2 and "common" in thr2


def test_optimal_thresholds_collinear_roc_run():
    """roc_curve's default drop_intermediate elides collinear ROC points;
    the midpoint below the J-optimum would then fall UNDER dropped scores
    and realize a worse operating point than the optimum it claims
    (targets [1,0,0,0], preds [.9,.8,.7,.6]: the dropped 0.8/0.7 run put
    the midpoint at 0.75 → specificity 2/3 instead of 1.0)."""
    import numpy as np

    from gavit_tpu.utils.metrics import MetricCalculator

    targets = np.asarray([[1], [0], [0], [0]], np.float32)
    preds = np.asarray([[0.9], [0.8], [0.7], [0.6]], np.float32)
    mc = MetricCalculator(["d"])
    t = mc.optimal_thresholds(targets, preds)["d"]
    at = mc.calculate_metrics(targets, preds, threshold=np.asarray([t]))
    assert at["d_sensitivity"] == 1.0
    assert at["d_specificity"] == 1.0
