"""Multi-label classification metrics.

Same metric battery and public API as the reference
(``/root/reference/src/utils/metrics.py:15-117``): per-disease AUC-ROC,
average precision, F1 at threshold 0.5, sensitivity/specificity/precision
from confusion counts, their means, exact-match ratio, bootstrap confidence
intervals (n=1000, α=0.05), and loss/AUC history plots.

Differences by design:
  * confusion counts are computed vectorised over all classes at once instead
    of one sklearn ``confusion_matrix`` call per class;
  * means are taken over the classes that actually have both labels present
    in the batch — the reference KeyErrors when a class is single-valued
    (``metrics.py:53-57`` reads keys its own guard at ``metrics.py:30``
    skipped); here degenerate classes are simply excluded from the mean.

Metrics run host-side on gathered predictions (NumPy/sklearn) — they are
offline relative to the TPU step and never sit on the device critical path.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
from sklearn.metrics import average_precision_score, roc_auc_score

logger = logging.getLogger(__name__)


class MetricCalculator:
    def __init__(self, disease_names):
        self.disease_names = list(disease_names)

    def calculate_metrics(self, targets, predictions, threshold=0.5):
        """``threshold``: scalar, or per-disease array [C] (e.g. the
        operating points from :meth:`optimal_thresholds`)."""
        targets = np.asarray(targets)
        predictions = np.asarray(predictions)
        binary = (predictions > np.asarray(threshold)).astype(np.float64)

        tp = ((binary == 1) & (targets == 1)).sum(axis=0).astype(np.float64)
        tn = ((binary == 0) & (targets == 0)).sum(axis=0).astype(np.float64)
        fp = ((binary == 1) & (targets == 0)).sum(axis=0).astype(np.float64)
        fn = ((binary == 0) & (targets == 1)).sum(axis=0).astype(np.float64)

        def safe_div(a, b):
            return float(a / b) if b > 0 else 0.0

        metrics: dict = {}
        valid = []
        for i, disease in enumerate(self.disease_names):
            if len(np.unique(targets[:, i])) < 2:
                continue  # AUC undefined for single-valued targets
            valid.append(disease)
            metrics[f"{disease}_auc"] = roc_auc_score(
                targets[:, i], predictions[:, i]
            )
            metrics[f"{disease}_ap"] = average_precision_score(
                targets[:, i], predictions[:, i]
            )
            prec = safe_div(tp[i], tp[i] + fp[i])
            rec = safe_div(tp[i], tp[i] + fn[i])
            metrics[f"{disease}_f1"] = (
                2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
            )
            metrics[f"{disease}_sensitivity"] = rec
            metrics[f"{disease}_specificity"] = safe_div(tn[i], tn[i] + fp[i])
            metrics[f"{disease}_precision"] = prec

        for mt in ("auc", "ap", "f1", "sensitivity", "specificity", "precision"):
            vals = [metrics[f"{d}_{mt}"] for d in valid]
            metrics[f"mean_{mt}"] = float(np.mean(vals)) if vals else 0.0

        metrics["exact_match"] = float(np.mean(np.all(binary == targets, axis=1)))
        return metrics

    def optimal_thresholds(self, targets, predictions) -> dict:
        """Per-disease operating points maximising Youden's J (sens + spec
        − 1) on the ROC curve — the reference evaluates only at 0.5, which
        is rarely the clinical operating point for low-prevalence findings
        (NIH positives run 1-18% per disease, so 0.5 yields near-zero
        sensitivity for rare classes). Diseases with single-valued targets
        are skipped (no curve).

        The thresholds are fit IN-SAMPLE on the predictions passed here, so
        metrics evaluated at them on the same set are optimistically biased
        — treat them as a tuning artifact; refit on a held-out split before
        quoting deployed operating-point numbers."""
        from sklearn.metrics import roc_curve

        targets = np.asarray(targets)
        predictions = np.asarray(predictions)
        out = {}
        for i, disease in enumerate(self.disease_names):
            if len(np.unique(targets[:, i])) < 2:
                continue
            # drop_intermediate would elide collinear ROC points, letting
            # the midpoint below fall under a dropped score and realize a
            # different (worse) operating point than the J-optimum
            fpr, tpr, thr = roc_curve(
                targets[:, i], predictions[:, i], drop_intermediate=False
            )
            j = int(np.argmax(tpr - fpr))
            # roc_curve's convention is score >= thr; the battery uses
            # strict > — take the midpoint down to the next-lower score
            t = thr[j + 1 : j + 2].mean() * 0.5 + thr[j] * 0.5 \
                if j + 1 < len(thr) else thr[j] - 1e-6
            if not np.isfinite(t):  # thr[0] is +inf when j == 0
                t = float(np.max(predictions[:, i]))
            out[disease] = float(t)
        return out

    def calculate_confidence_intervals(
        self, targets, predictions, n_bootstrap: int = 1000, alpha: float = 0.05,
        seed: int | None = None,
    ):
        """Bootstrap CIs over resampled metric distributions
        (reference ``metrics.py:66-89``)."""
        targets = np.asarray(targets)
        predictions = np.asarray(predictions)
        n = len(targets)
        rng = np.random.default_rng(seed)
        samples: list[dict] = []
        for _ in range(n_bootstrap):
            idx = rng.integers(0, n, n)
            samples.append(self.calculate_metrics(targets[idx], predictions[idx]))

        keys = set(samples[0])
        for s in samples[1:]:
            keys &= set(s)
        ci = {}
        for key in sorted(keys):
            vals = [s[key] for s in samples]
            ci[f"{key}_ci"] = (
                float(np.percentile(vals, alpha / 2 * 100)),
                float(np.percentile(vals, (1 - alpha / 2) * 100)),
            )
        return ci

    def plot_metrics(self, metrics_history, save_dir):
        """Loss + per-disease AUC history plots (reference
        ``metrics.py:91-117``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)

        plt.figure(figsize=(10, 6))
        plt.plot([m["loss"] for m in metrics_history], label="Loss")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.title("Training Loss")
        plt.legend()
        plt.savefig(save_dir / "loss_curve.png")
        plt.close()

        plt.figure(figsize=(12, 8))
        for disease in self.disease_names:
            series = [m.get(f"{disease}_auc") for m in metrics_history]
            if any(v is not None for v in series):
                plt.plot([v if v is not None else np.nan for v in series],
                         label=disease)
        plt.xlabel("Epoch")
        plt.ylabel("AUC-ROC")
        plt.title("AUC-ROC per Disease")
        plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
        plt.tight_layout()
        plt.savefig(save_dir / "auc_curves.png")
        plt.close()
