"""Trainer engine: crash-safe resume and best-checkpoint selection."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.training.trainer import TrainRun, train  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def _mk_run(ptbxl_dir, tmp_path, epochs, resume=False, seed=0):
    train_ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    val_ds = PTBXLDataset(ptbxl_dir, "val", CLASSES)
    model, variables = build_ecgcnn(num_labels=5, seed=seed)
    ckpt_dir = tmp_path / "ckpts"
    os.makedirs(ckpt_dir, exist_ok=True)
    return TrainRun(
        model=model,
        variables=variables,
        train_ds=train_ds,
        val_ds=val_ds,
        batch_size=8,
        epochs=epochs,
        lr=1e-3,
        weight_decay=1e-4,
        seed=42,
        run_name="resume_test",
        metrics_csv=str(tmp_path / "logs" / "metrics.csv"),
        ckpt_path=str(ckpt_dir / "best.npz"),
        config_path="cfg.yaml",
        classes=CLASSES,
        pth_export=False,
        resume=resume,
    )


@pytest.mark.slow
def test_resume_continues_from_epoch(ptbxl_dir, tmp_path, capsys):
    run1 = _mk_run(ptbxl_dir, tmp_path, epochs=2)
    train(run1)
    out1 = capsys.readouterr().out
    assert "Epoch 1/2" in out1 and "Epoch 2/2" in out1
    assert os.path.exists(tmp_path / "ckpts" / "best.npz")

    # resume with a HIGHER epoch budget: must start at epoch 3, not 1
    run2 = _mk_run(ptbxl_dir, tmp_path, epochs=4, resume=True)
    train(run2)
    out2 = capsys.readouterr().out
    assert "Resumed from" in out2
    assert "Epoch 3/4" in out2 and "Epoch 4/4" in out2
    assert "Epoch 1/4" not in out2

    # CSV accumulated 4 epoch rows total (append semantics)
    import csv as csvmod

    with open(tmp_path / "logs" / "metrics.csv") as f:
        rows = list(csvmod.reader(f))
    assert [r[2] for r in rows[1:]] == ["1", "2", "3", "4"]


@pytest.mark.slow
def test_no_resume_flag_starts_fresh(ptbxl_dir, tmp_path, capsys):
    train(_mk_run(ptbxl_dir, tmp_path, epochs=1))
    capsys.readouterr()
    train(_mk_run(ptbxl_dir, tmp_path, epochs=1, resume=False))
    out = capsys.readouterr().out
    assert "Resumed from" not in out
    assert "Epoch 1/1" in out
