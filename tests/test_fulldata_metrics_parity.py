"""Full-test-split metric parity on the reference's real prediction artifacts.

The reference's per-sample prediction CSVs (2,198 PTB-XL test records) are
bundled under outputs/*/preds (experiment artifacts, like the checkpoints).
Recomputing metrics from them with this framework's compute_metrics must
reproduce the reference's published results (BASELINE.md) to full precision —
closing the loop: converted weights match per-sample probs (golden tests),
and the metric stack matches on the full real test split (here).
"""

import os

import numpy as np
import pandas as pd
import pytest

from ptbxl_tpu.training.metrics import compute_metrics

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MERGED = os.path.join(HERE, "outputs/merged/test_03_04_05_merged.csv")

LABELS = ["CD", "HYP", "MI", "NORM", "STTC"]  # script-10 alphabetical order


@pytest.fixture(scope="module")
def merged():
    if not os.path.exists(MERGED):
        pytest.skip("reference prediction artifacts not present")
    return pd.read_csv(MERGED)


def test_baseline_metrics_match_reference(merged):
    y = merged[[f"y_true_{c}" for c in LABELS]].values.astype(np.float32)
    p = merged[[f"y_prob_{c}" for c in LABELS]].values.astype(np.float32)
    m = compute_metrics(y, p)
    assert m["auroc_macro"] == pytest.approx(0.9080, abs=5e-5)  # BASELINE.md
    assert m["auprc_macro"] == pytest.approx(0.7681, abs=5e-5)


def test_multimodal_metrics_match_reference(merged):
    y = merged[[f"y_true_{c}" for c in LABELS]].values.astype(np.float32)
    p = merged[[f"y_prob_{c}_mm" for c in LABELS]].values.astype(np.float32)
    m = compute_metrics(y, p)
    assert m["auroc_macro"] == pytest.approx(0.9053, abs=5e-5)
    assert m["auprc_macro"] == pytest.approx(0.7650, abs=5e-5)


def test_af_metrics_match_reference(merged):
    y = merged["y_true_AF"].values.astype(np.float32).reshape(-1, 1)
    p = merged["y_prob_AF"].values.astype(np.float32).reshape(-1, 1)
    m = compute_metrics(y, p)
    assert m["auroc_macro"] == pytest.approx(0.9719, abs=5e-5)
    assert m["auprc_macro"] == pytest.approx(0.8214, abs=5e-5)


def test_merge_script_reproduces_reference_merged_csv(tmp_path):
    """Running 09 on the bundled per-task CSVs rebuilds the merged CSV exactly."""
    import subprocess
    import sys

    if not os.path.exists(MERGED):
        pytest.skip("reference prediction artifacts not present")
    out = str(tmp_path / "merged.csv")
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts/09_merge_all_test.py"),
         "--baseline_csv", os.path.join(HERE, "outputs/ecg_baseline/preds/ecg_baseline_test_preds.csv"),
         "--multimodal_csv", os.path.join(HERE, "outputs/ecg_multimodal/preds/ecg_multimodal_test_preds.csv"),
         "--af_csv", os.path.join(HERE, "outputs/af_binary/preds/af_binary_test_preds.csv"),
         "--out_csv", out],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    a = pd.read_csv(out)
    b = pd.read_csv(MERGED)
    assert list(a.columns) == list(b.columns)
    assert a.shape == (2198, 28)
    for c in a.columns:
        np.testing.assert_array_almost_equal(a[c].values, b[c].values, decimal=10)
