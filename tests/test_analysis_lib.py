"""Analysis library backends (merge + figure metric helpers)."""

import numpy as np
import pandas as pd
import pytest

from ptbxl_tpu.analysis.merge import merge_prediction_frames


def _frame(prefix, n=4, suffix=""):
    rng = np.random.default_rng(0)
    cols = {}
    for cls in ("MI", "STTC"):
        cols[f"y_true_{cls}"] = rng.integers(0, 2, n)
        cols[f"y_prob_{cls}{suffix}"] = rng.uniform(size=n)
        cols[f"y_pred_{cls}{suffix}"] = rng.integers(0, 2, n)
    return pd.DataFrame(cols)


def test_merge_strips_duplicate_truth_and_orders_columns():
    base = _frame("b")
    mm = _frame("m", suffix="_mm")
    af = pd.DataFrame({"y_true_AF": [0, 1, 0, 0], "y_prob_AF": [0.1] * 4, "y_pred_AF": [0] * 4})
    merged = merge_prediction_frames(base, mm, af)
    # baseline truth kept once; multimodal truth dropped
    assert list(merged.columns).count("y_true_MI") == 1
    assert merged.shape == (4, 6 + 4 + 3)
    # baseline columns first, then mm (sans truth), then AF
    assert list(merged.columns[:6]) == list(base.columns)
    assert list(merged.columns[-3:]) == ["y_true_AF", "y_prob_AF", "y_pred_AF"]


def test_merge_rejects_row_mismatch():
    with pytest.raises(ValueError, match="Row count mismatch"):
        merge_prediction_frames(_frame("b"), _frame("m", n=3, suffix="_mm"), _frame("a"))


def test_per_class_scores_nan_for_degenerate_class():
    from ptbxl_tpu.analysis.figures import per_class_scores

    y = np.array([[1, 0], [0, 0], [1, 0], [0, 0]], dtype=float)  # class 1 all-neg
    p = np.array([[0.9, 0.4], [0.2, 0.3], [0.8, 0.6], [0.1, 0.5]])
    m = per_class_scores(y, p)
    assert m["auroc_per_class"][0] == 1.0
    assert np.isnan(m["auroc_per_class"][1])
    assert m["auroc_macro"] == 1.0  # nanmean skips the degenerate class


def test_pick_demo_indices_deterministic_and_covering():
    from ptbxl_tpu.data.demo_export import pick_demo_indices

    rng = np.random.default_rng(0)
    y = (rng.uniform(size=(50, 5)) > 0.8).astype(np.float32)
    idx1, why1 = pick_demo_indices(y, max_per_class=1, extra_all_zero=2, seed=7)
    idx2, why2 = pick_demo_indices(y, max_per_class=1, extra_all_zero=2, seed=7)
    assert idx1 == idx2 and why1 == why2
    # one positive covered per class that has positives
    for c in range(5):
        if y[:, c].sum() > 0:
            assert any(why1[i] == f"pos_{['MI','STTC','HYP','CD','NORM'][c]}" for i in idx1
                       if i in why1)
    # all-zero extras are actually all-zero
    zeros = [i for i, w in why1.items() if w == "all_zero"]
    for i in zeros:
        assert y[i].sum() == 0
