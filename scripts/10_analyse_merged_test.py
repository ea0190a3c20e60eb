#!/usr/bin/env python
# scripts/10_analyse_merged_test.py — recompute metrics from the merged CSV.
# Reference quirk preserved: this script alone uses ALPHABETICAL label order
# CD, HYP, MI, NORM, STTC (reference: scripts/10:37).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ptbxl_tpu.training.metrics import compute_metrics  # noqa: E402

ECG_LABELS = ["CD", "HYP", "MI", "NORM", "STTC"]  # alphabetical (quirk)


def _report(header, y_true, y_prob, threshold):
    print(f"\n{header}")
    for k, v in compute_metrics(y_true, y_prob, threshold=threshold).items():
        print(f"  {k}: {v}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--merged_csv", type=str,
        default="outputs/merged/test_03_04_05_merged.csv",
        help="Merged prediction file from baseline, multimodal and AF models.",
    )
    parser.add_argument(
        "--threshold", type=float, default=0.5,
        help="Threshold used for computing F1 and other metrics.",
    )
    args = parser.parse_args()

    print("[INFO] Loading merged CSV:", args.merged_csv)
    df = pd.read_csv(args.merged_csv)
    print("[INFO] merged shape:", df.shape)
    print("[INFO] ECG labels:", ECG_LABELS)

    truth = df[[f"y_true_{lbl}" for lbl in ECG_LABELS]].values.astype(np.float32)

    base_probs = df[[f"y_prob_{lbl}" for lbl in ECG_LABELS]].values.astype(np.float32)
    _report("[Baseline ECG][TEST] metrics:", truth, base_probs, args.threshold)

    mm_cols = [f"y_prob_{lbl}_mm" for lbl in ECG_LABELS]
    if all(c in df.columns for c in mm_cols):
        _report("[ECG + demographics][TEST] metrics:",
                truth, df[mm_cols].values.astype(np.float32), args.threshold)
    else:
        print("\n[WARN] Multimodal columns not found; skip ECG+demographics metrics.")

    if {"y_true_AF", "y_prob_AF"} <= set(df.columns):
        _report("[AF binary][TEST] metrics:",
                df["y_true_AF"].values.astype(np.float32).reshape(-1, 1),
                df["y_prob_AF"].values.astype(np.float32).reshape(-1, 1),
                args.threshold)
    else:
        print("\n[WARN] AF columns not found in merged CSV.")


if __name__ == "__main__":
    main()
