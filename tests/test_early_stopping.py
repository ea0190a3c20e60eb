"""Early-stopping logic (multimodal-only feature, reference scripts/04:212-216)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import ptbxl_tpu.training.trainer as trainer_mod  # noqa: E402
from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.training.trainer import TrainRun, train  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


@pytest.mark.slow
def test_early_stopping_triggers(ptbxl_dir, tmp_path, monkeypatch, capsys):
    """Forced non-improving val AUPRC must stop after `patience` epochs."""
    auprc_sequence = iter([0.5, 0.4, 0.3, 0.2, 0.1, 0.05])

    def fake_eval(state, eval_step, batches, threshold=0.5, loss_mode="per_sample", desc=None):
        list(batches)  # drain the prefetch thread
        return {
            "auroc_macro": 0.5,
            "auprc_macro": next(auprc_sequence),
            "f1_macro": 0.0,
            "bce_loss": 1.0,
        }

    monkeypatch.setattr(trainer_mod, "eval_one_epoch", fake_eval)

    model, variables = build_ecgcnn(num_labels=5, seed=0)
    run = TrainRun(
        model=model,
        variables=variables,
        train_ds=PTBXLDataset(ptbxl_dir, "train", CLASSES),
        val_ds=PTBXLDataset(ptbxl_dir, "val", CLASSES),
        batch_size=8,
        epochs=10,
        lr=1e-3,
        weight_decay=0.0,
        seed=42,
        run_name="es_test",
        metrics_csv=str(tmp_path / "m.csv"),
        ckpt_path=str(tmp_path / "best.npz"),
        config_path="c.yaml",
        classes=CLASSES,
        early_stop_patience=2,
        pth_export=False,
    )
    train(run)
    out = capsys.readouterr().out
    # epoch 1 is best (0.5); epochs 2 and 3 don't improve -> stop after 3
    assert "Epoch 3/10" in out
    assert "Epoch 4/10" not in out
    assert "[INFO] Early stopping." in out
    assert os.path.exists(tmp_path / "best.npz")  # best ckpt from epoch 1
