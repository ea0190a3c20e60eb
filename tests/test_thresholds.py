"""Per-class threshold search (opt-in feature; dormant in the reference)."""

import numpy as np

from ptbxl_tpu.training.thresholds import apply_thresholds, search_thresholds_per_class


def test_finds_shifted_optimum():
    rng = np.random.default_rng(0)
    n = 2000
    y = (rng.uniform(size=(n, 2)) > 0.7).astype(np.float32)
    # class 0: probs centered around 0.5 decision -> ~0.5 optimal
    p0 = np.clip(y[:, 0] * 0.6 + 0.2 + 0.1 * rng.standard_normal(n), 0, 1)
    # class 1: systematically depressed probabilities -> optimum well below 0.5
    p1 = np.clip(y[:, 1] * 0.25 + 0.05 + 0.04 * rng.standard_normal(n), 0, 1)
    probs = np.stack([p0, p1], axis=1)

    th = search_thresholds_per_class(y, probs)
    assert 0.3 <= th[0] <= 0.7
    assert th[1] < 0.35

    from sklearn.metrics import f1_score

    pred_default = (probs >= 0.5).astype(int)
    pred_searched = apply_thresholds(probs, th)
    f1_def = f1_score(y, pred_default, average="macro", zero_division=0)
    f1_srch = f1_score(y, pred_searched, average="macro", zero_division=0)
    assert f1_srch >= f1_def


def test_quantile_candidates_resolve_compressed_distribution():
    """A compressed probability distribution (positive median ~1e-3, the
    AF-hard showdown shape) is unreachable for the legacy fixed 0.05-step
    grid — every grid point sits above nearly all probabilities, so the
    searched threshold predicts all-negative.  The quantile candidates
    (default since round 4) must recover a useful threshold."""
    rng = np.random.default_rng(1)
    n = 4000
    y = (rng.uniform(size=(n, 1)) > 0.9).astype(np.float32)
    # positives ~2e-3, negatives ~2e-4: perfectly separable, all below 0.05
    p = np.where(y[:, 0] > 0, 2e-3, 2e-4) * np.exp(0.3 * rng.standard_normal(n))
    probs = p[:, None].astype(np.float64)

    from sklearn.metrics import f1_score

    th_grid = search_thresholds_per_class(y, probs, grid=np.arange(0.05, 0.951, 0.05))
    th_q = search_thresholds_per_class(y, probs)
    f1_grid = f1_score(y[:, 0], (probs[:, 0] >= th_grid[0]).astype(int), zero_division=0)
    f1_q = f1_score(y[:, 0], (probs[:, 0] >= th_q[0]).astype(int), zero_division=0)
    assert f1_grid == 0.0  # the failure mode the quantile candidates fix
    assert th_q[0] < 0.05
    assert f1_q > 0.9


def test_fit_on_val_report_uses_val_not_test():
    """fit_on_val_report (round 5, the eval-CLI workflow) must fit thresholds
    on the VALIDATION split and only APPLY them to test — fitting on test
    would be a 1-parameter oracle.  Construct val/test with the same
    depressed-probability geometry: the val-fitted threshold must transfer
    and beat fixed 0.5 on test."""
    from sklearn.metrics import f1_score

    from ptbxl_tpu.training.thresholds import fit_on_val_report

    rng = np.random.default_rng(2)

    def make(n, seed_shift):
        y = (rng.uniform(size=(n, 2)) > 0.8).astype(np.float32)
        # probs systematically depressed: optimum well below 0.5
        p = np.clip(y * 0.3 + 0.05 + 0.03 * rng.standard_normal((n, 2)), 0, 1)
        return y, p

    yv, pv = make(1500, 0)
    yt, pt = make(1500, 1)
    thr, fitted = fit_on_val_report(yv, pv, yt, pt)
    assert thr.shape == (2,)
    assert np.all(thr < 0.5)  # depressed probs -> low thresholds
    f1_fixed = f1_score(yt, (pt >= 0.5).astype(int), average="macro",
                        zero_division=0)
    assert fitted["f1_macro"] > f1_fixed
    # fitted metrics keep the standard compute_metrics schema
    assert {"auroc_macro", "auprc_macro", "f1_macro"} <= set(fitted)


def test_degenerate_classes_fall_back():
    y = np.zeros((10, 2), np.float32)
    y[:, 1] = 1.0
    probs = np.random.default_rng(0).uniform(size=(10, 2))
    th = search_thresholds_per_class(y, probs)
    np.testing.assert_array_equal(th, [0.5, 0.5])
