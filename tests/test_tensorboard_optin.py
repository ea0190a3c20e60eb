"""Opt-in TensorBoard logging (dormant by default, like the reference)."""

import glob
import os

import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("torch.utils.tensorboard")

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.training.trainer import TrainRun, train  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def _run(ptbxl_dir, tmp_path):
    model, variables = build_ecgcnn(num_labels=5, seed=0)
    return TrainRun(
        model=model, variables=variables,
        train_ds=PTBXLDataset(ptbxl_dir, "train", CLASSES),
        val_ds=PTBXLDataset(ptbxl_dir, "val", CLASSES),
        batch_size=8, epochs=1, lr=1e-3, weight_decay=0.0, seed=42,
        run_name="tb_test",
        metrics_csv=str(tmp_path / "m.csv"),
        ckpt_path=str(tmp_path / "best.npz"),
        config_path="c.yaml", classes=CLASSES, pth_export=False,
    )


@pytest.mark.slow
def test_tb_dormant_by_default(ptbxl_dir, tmp_path, monkeypatch):
    monkeypatch.delenv("PTBXL_TPU_TB", raising=False)
    train(_run(ptbxl_dir, tmp_path))
    assert not glob.glob(str(tmp_path / "**" / "events.out.tfevents.*"), recursive=True)


@pytest.mark.slow
def test_tb_optin_writes_events(ptbxl_dir, tmp_path, monkeypatch):
    tb_dir = str(tmp_path / "tb")
    monkeypatch.setenv("PTBXL_TPU_TB", tb_dir)
    train(_run(ptbxl_dir, tmp_path))
    events = glob.glob(os.path.join(tb_dir, "tb_test", "events.out.tfevents.*"))
    assert events, "no TensorBoard event files written"
