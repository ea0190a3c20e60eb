"""compute_metrics parity with the reference's sklearn semantics."""

import numpy as np

from ptbxl_tpu.training.metrics import compute_metrics


def test_perfect_predictions():
    y = np.array([[1, 0], [0, 1], [1, 1], [0, 0]], dtype=np.float32)
    p = y * 0.98 + 0.01
    m = compute_metrics(y, p)
    assert m["auroc_macro"] == 1.0
    assert m["auprc_macro"] == 1.0
    assert m["f1_macro"] == 1.0


def test_single_class_all_negative_gives_nan_auroc():
    # reference: metrics.py:23-34 — ValueError from sklearn -> NaN
    y = np.zeros((8, 2), dtype=np.float32)
    p = np.random.default_rng(0).uniform(size=(8, 2))
    m = compute_metrics(y, p)
    assert np.isnan(m["auroc_macro"])
    # f1 with zero_division=0 stays finite
    assert m["f1_macro"] == 0.0


def test_threshold_affects_f1_only():
    y = np.array([[1], [0], [1], [0]], dtype=np.float32)
    p = np.array([[0.6], [0.4], [0.55], [0.45]])
    lo = compute_metrics(y, p, threshold=0.5)
    hi = compute_metrics(y, p, threshold=0.58)
    assert lo["auroc_macro"] == hi["auroc_macro"] == 1.0
    assert lo["f1_macro"] == 1.0 and hi["f1_macro"] < 1.0


def test_matches_reference_formula_binary_af_shape():
    # AF uses [N,1] arrays (reference: scripts/08:124-129)
    y = np.array([[1], [0], [0], [1], [0]], dtype=np.float32)
    p = np.array([[0.9], [0.2], [0.8], [0.7], [0.1]], dtype=np.float32)
    m = compute_metrics(y, p)
    from sklearn.metrics import roc_auc_score

    assert abs(m["auroc_macro"] - roc_auc_score(y, p)) < 1e-12
