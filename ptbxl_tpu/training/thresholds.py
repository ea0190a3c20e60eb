"""Per-class decision-threshold search.

The reference declares ``metrics.thresholds: "search_per_class"`` in its
configs but never implements it — the threshold is fixed at 0.5 everywhere
(SURVEY.md §5; reference: configs/base.yaml:23, loop.py:70).  The CLI surface
keeps that dormant behavior for parity; this module provides the capability
as an opt-in library function for users who want it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from sklearn.metrics import f1_score


def quantile_candidates(probs: np.ndarray, positives: Optional[np.ndarray] = None,
                        n: int = 199) -> np.ndarray:
    """Candidate thresholds for one class: quantiles of ``probs`` + 0.5 +
    (when given) every positive sample's probability.  All-sample quantiles
    alone under-resolve rare classes — with prevalence below ~1/n the finest
    quantile still sits far into the negative mass, so the search can't
    isolate the positives; including the positive values themselves makes the
    search exact for them at negligible cost."""
    parts = [np.quantile(probs, np.linspace(0.005, 0.995, n)), [0.5]]
    if positives is not None and positives.size:
        parts.append(positives)
    return np.unique(np.concatenate(parts))


def search_thresholds_per_class(
    y_true: np.ndarray,
    y_prob: np.ndarray,
    grid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """F1-maximizing threshold per class.

    Candidate thresholds default to each class's probability QUANTILES
    plus 0.5 plus every positive sample's probability (rare classes sit
    between quantiles): a fixed grid cannot resolve compressed probability
    distributions — e.g. a hard binary task where the positive-class median
    sits at ~1e-3, so every fixed grid point lands above almost all
    probabilities and the search degenerates to all-negative predictions
    (the round-4 showdown-calibration finding, docs/PARITY.md).

    Deployable workflow: fit on VALIDATION probabilities and apply to test —
    fitting on the evaluation set itself is a 1-parameter oracle.

    Args:
        y_true: [N, C] binary labels
        y_prob: [N, C] probabilities
        grid: explicit candidate thresholds (overrides the quantile
            candidates; e.g. ``np.arange(0.05, 0.951, 0.05)`` for the
            legacy fixed grid)
    Returns:
        [C] thresholds; classes with no positives fall back to 0.5
    """
    n_classes = y_true.shape[1]
    out = np.full(n_classes, 0.5, dtype=np.float64)
    for c in range(n_classes):
        yt = y_true[:, c]
        if yt.sum() == 0 or yt.sum() == len(yt):
            continue
        if grid is None:
            cand = quantile_candidates(y_prob[:, c],
                                       positives=y_prob[yt > 0.5, c])
        else:
            cand = np.asarray(grid, dtype=np.float64)
        best_f1, best_t = -1.0, 0.5
        for t in cand:
            f1 = f1_score(yt, (y_prob[:, c] >= t).astype(int), zero_division=0)
            if f1 > best_f1:
                best_f1, best_t = f1, float(t)
        out[c] = best_t
    return out


def apply_thresholds(y_prob: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """[N, C] probs, [C] thresholds -> [N, C] int predictions."""
    return (y_prob >= np.asarray(thresholds)[None, :]).astype(int)


def fit_on_val_report(
    y_true_val: np.ndarray,
    y_prob_val: np.ndarray,
    y_true_test: np.ndarray,
    y_prob_test: np.ndarray,
):
    """Deployable threshold-search workflow for the eval CLIs (round-5
    VERDICT item 6): fit per-class F1 thresholds on VALIDATION predictions,
    apply to test.  Returns ``(thresholds [C], fitted test metrics dict)``.
    Fitting on the evaluation set itself would be a 1-parameter oracle —
    hence the val split."""
    from .metrics import compute_metrics

    thr = search_thresholds_per_class(y_true_val, y_prob_val)
    fitted = compute_metrics(y_true_test, y_prob_test, threshold=thr)
    return thr, fitted
