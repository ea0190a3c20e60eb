"""Evaluation metrics — identical semantics to the reference (src/training/metrics.py).

Macro AUROC / AUPRC via sklearn with NaN on ValueError (e.g. a class with no
positive samples in the split), and macro F1 at a fixed threshold with
``zero_division=0`` (reference: metrics.py:21-40).  These run on host numpy
arrays gathered from the device after an eval epoch.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn.metrics import average_precision_score, f1_score, roc_auc_score


def compute_metrics(
    y_true: np.ndarray, y_prob: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Macro AUROC/AUPRC/F1 for multi-label classification.

    Args:
        y_true: [N, L] ground-truth binary labels
        y_prob: [N, L] predicted probabilities
        threshold: probability cutoff for the F1 computation
    """
    metrics: Dict[str, float] = {}

    try:
        metrics["auroc_macro"] = roc_auc_score(y_true, y_prob, average="macro")
    except ValueError:
        metrics["auroc_macro"] = float("nan")

    try:
        metrics["auprc_macro"] = average_precision_score(y_true, y_prob, average="macro")
    except ValueError:
        metrics["auprc_macro"] = float("nan")

    y_pred = (y_prob >= threshold).astype(int)
    metrics["f1_macro"] = f1_score(y_true, y_pred, average="macro", zero_division=0)

    return metrics
