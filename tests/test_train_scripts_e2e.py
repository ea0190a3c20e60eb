"""End-to-end CLI training runs on the hermetic fixture (subprocess)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCH_HEADER = [
    "datetime", "run_name", "epoch", "train_bce", "val_auroc_macro",
    "val_auprc_macro", "val_f1_macro", "val_bce_loss", "ckpt_path", "config_path",
]


def _write_cfg(tmp_path, ptbxl_dir, name, extra=""):
    cfg = tmp_path / f"{name}.yaml"
    cfg.write_text(
        f"""seed: 42
data:
  base_dir: {ptbxl_dir}
  normalize: per_lead
  labels: ["MI", "STTC", "HYP", "CD", "NORM"]
train:
  batch_size: 8
  epochs: 2
  lr: 1e-3
  weight_decay: 1e-4
{extra}
"""
    )
    return str(cfg)


def _run(script, cfg, tmp_path):
    env = dict(os.environ, PTBXL_TPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", script), "--config", cfg],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=900,
    )


def _check_csv(path, run_name, epochs):
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == EPOCH_HEADER
    assert len(rows) == 1 + epochs
    assert rows[1][1] == run_name
    assert int(rows[1][2]) == 1 and int(rows[epochs][2]) == epochs
    for r in rows[1:]:
        assert np.isfinite(float(r[3]))


@pytest.mark.slow
def test_train_baseline_e2e(ptbxl_dir, tmp_path):
    cfg = _write_cfg(
        tmp_path, ptbxl_dir, "bl",
        extra='model:\n  ecg:\n    in_leads: 12\n    feat_dim: 256\nlog:\n  out_dir: "outputs"\n',
    )
    r = _run("03_train_ecg_baseline.py", cfg, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "outputs" / "ecg_baseline")
    _check_csv(os.path.join(out, "logs", "metrics_ecg_baseline.csv"), "ecg_baseline", 2)
    assert os.path.exists(os.path.join(out, "ckpts", "ecg_baseline_best.npz"))
    assert os.path.exists(os.path.join(out, "ckpts", "ecg_baseline_best.pth"))
    assert "Train BCE:" in r.stdout
    assert "★ New best AUPRC:" in r.stdout

    # the exported .pth round-trips into the reference layout
    from ptbxl_tpu.models.params_io import read_pth

    ck = read_pth(os.path.join(out, "ckpts", "ecg_baseline_best.pth"))
    assert ck["classes"] == ["MI", "STTC", "HYP", "CD", "NORM"]
    assert "backbone.0.net.0.weight" in ck["model_state"]


@pytest.mark.slow
def test_train_multimodal_e2e_with_warmstart(ptbxl_dir, tmp_path):
    # first make a baseline ckpt to warm-start from
    cfg_bl = _write_cfg(
        tmp_path, ptbxl_dir, "bl",
        extra='model:\n  ecg:\n    in_leads: 12\n    feat_dim: 256\nlog:\n  out_dir: "outputs"\n',
    )
    r = _run("03_train_ecg_baseline.py", cfg_bl, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    bl_ckpt = str(tmp_path / "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")

    cfg = _write_cfg(
        tmp_path, ptbxl_dir, "mm",
        extra=(
            "  early_stop_patience: 8\n"
            "model:\n  ecg_multimodal:\n    in_leads: 12\n    ecg_feat_dim: 256\n"
            f"    demo_hidden_dim: 64\n    pretrained_ecg_ckpt: {bl_ckpt}\n"
            'log:\n  out_dir: "outputs/ecg_multimodal"\n'
        ),
    )
    r = _run("04_train_multimodal_prototype.py", cfg, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "outputs" / "ecg_multimodal")
    _check_csv(os.path.join(out, "logs", "metrics_ecg_multimodal.csv"), "ecg_multimodal", 2)
    assert os.path.exists(os.path.join(out, "ckpts", "ecg_multimodal_best.npz"))
    assert "Loading pretrained ECG encoder" in r.stdout
    assert "Train-ECG-MM BCE:" in r.stdout


@pytest.mark.slow
def test_train_af_e2e(ptbxl_dir, tmp_path):
    cfg = _write_cfg(
        tmp_path, ptbxl_dir, "af",
        extra='model:\n  ecg:\n    in_leads: 12\n    feat_dim: 256\nlog:\n  out_dir: outputs/af_binary\n  run_name: af_binary_ecg\n',
    )
    r = _run("05_train_af_binary.py", cfg, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "outputs" / "af_binary")
    _check_csv(os.path.join(out, "logs", "metrics_af_binary.csv"), "af_binary_ecg", 2)

    # AF checkpoint carries no classes (reference parity)
    from ptbxl_tpu.models.params_io import load_npz

    _, classes = load_npz(os.path.join(out, "ckpts", "af_binary_best.npz"))
    assert classes is None
