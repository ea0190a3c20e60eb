"""CLI edge cases: .npy demo input, custom thresholds, missing checkpoint."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_BL = os.path.join(HERE, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")


def _run(script, args, cwd, expect_ok=True):
    env = dict(os.environ, PTBXL_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", script), *args],
        capture_output=True, text=True, cwd=str(cwd), env=env, timeout=600,
    )
    if expect_ok:
        assert r.returncode == 0, f"{script}:\n{r.stdout[-1500:]}\n{r.stderr[-2500:]}"
    return r


@pytest.mark.slow
def test_demo_inference_accepts_npy(tmp_path):
    npy = os.path.join(HERE, "data/demo/demo_ecg_0.npy")
    r = _run("00_demo_inference.py",
             ["--demo_path", npy, "--ckpt", CKPT_BL, "--class_idx", "2", "--lead", "3"],
             tmp_path)
    assert "Predicted probabilities:" in r.stdout
    assert "Ground-truth labels:" not in r.stdout  # .npy carries no labels
    assert (tmp_path / "outputs/demo/demo_ecg_0_gradcam_HYP.png").exists()


@pytest.mark.slow
def test_demo_inference_accepts_reference_pth(tmp_path):
    """Reference .pth checkpoints load directly (conversion on the fly)."""
    pth = "/root/reference/outputs/ecg_baseline/ckpts/ecg_baseline_best.pth"
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint not mounted")
    r = _run("00_demo_inference.py",
             ["--demo_path", os.path.join(HERE, "data/demo/single/single_sample_00.npz"),
              "--ckpt", pth], tmp_path)
    assert "MI: 0.972" in r.stdout  # same probs as the .npz path


@pytest.mark.slow
def test_threshold_changes_preds_not_probs(ptbxl_dir, tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"seed: 42\ndata:\n  base_dir: {ptbxl_dir}\n  labels: [\"MI\", \"STTC\", \"HYP\", \"CD\", \"NORM\"]\n"
        "train:\n  batch_size: 4\nmodel:\n  ecg:\n    feat_dim: 256\n"
    )
    lo = str(tmp_path / "lo.csv")
    hi = str(tmp_path / "hi.csv")
    _run("06_ecg_baseline_test.py",
         ["--config", str(cfg), "--ckpt", CKPT_BL, "--out_csv", lo, "--threshold", "0.1"], tmp_path)
    _run("06_ecg_baseline_test.py",
         ["--config", str(cfg), "--ckpt", CKPT_BL, "--out_csv", hi, "--threshold", "0.9"], tmp_path)
    dlo, dhi = pd.read_csv(lo), pd.read_csv(hi)
    np.testing.assert_allclose(dlo["y_prob_MI"], dhi["y_prob_MI"])
    assert dlo["y_pred_MI"].sum() >= dhi["y_pred_MI"].sum()


@pytest.mark.slow
def test_missing_ckpt_fails_cleanly(ptbxl_dir, tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"seed: 42\ndata:\n  base_dir: {ptbxl_dir}\ntrain:\n  batch_size: 4\n"
    )
    r = _run("08_af_binary_test.py",
             ["--config", str(cfg), "--ckpt", str(tmp_path / "nope.npz"),
              "--out_csv", str(tmp_path / "o.csv")], tmp_path, expect_ok=False)
    assert r.returncode != 0
    assert "Checkpoint not found" in (r.stderr + r.stdout)
