"""Epoch-metrics CSV logger: schema, header-on-create, append semantics."""

import csv

from ptbxl_tpu.utils.csv_log import EPOCH_CSV_HEADER, log_epoch_to_csv


def test_header_and_append(tmp_path):
    path = str(tmp_path / "logs" / "metrics.csv")
    metrics = {"auroc_macro": 0.9, "auprc_macro": 0.7, "f1_macro": 0.5, "bce_loss": 0.3}

    log_epoch_to_csv(path, "run", 1, 0.42, metrics, "ckpt.npz", "cfg.yaml")
    log_epoch_to_csv(path, "run", 2, 0.41, metrics, "ckpt.npz", "cfg.yaml")

    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == EPOCH_CSV_HEADER
    assert len(rows) == 3  # header + 2 epochs, single header on append
    assert rows[1][1:4] == ["run", "1", "0.42"]
    assert rows[2][2] == "2"


def test_missing_metrics_default_minus_one(tmp_path):
    path = str(tmp_path / "m.csv")
    log_epoch_to_csv(path, "r", 1, 0.1, {}, "c", "cfg")
    with open(path) as f:
        row = list(csv.reader(f))[1]
    # auroc/auprc/f1/bce default to -1 (reference: scripts/03:49-55 .get(..., -1))
    assert row[4:8] == ["-1.0", "-1.0", "-1.0", "-1.0"]
