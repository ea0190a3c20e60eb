#!/usr/bin/env python
# scripts/09_merge_all_test.py — merge the three per-task prediction CSVs.
# Library backend: ptbxl_tpu/analysis/merge.py (reference: scripts/09).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

from ptbxl_tpu.analysis.merge import merge_prediction_frames  # noqa: E402

DEFAULTS = {
    "baseline_csv": "outputs/ecg_baseline/preds/ecg_baseline_test_preds.csv",
    "multimodal_csv": "outputs/ecg_multimodal/preds/ecg_multimodal_test_preds.csv",
    "af_csv": "outputs/af_binary/preds/af_binary_test_preds.csv",
    "out_csv": "outputs/merged/test_03_04_05_merged.csv",
}


def main():
    parser = argparse.ArgumentParser()
    for flag, default in DEFAULTS.items():
        parser.add_argument(f"--{flag}", type=str, default=default)
    args = parser.parse_args()

    frames = {}
    for name, path in (("baseline", args.baseline_csv),
                       ("multimodal", args.multimodal_csv),
                       ("AF", args.af_csv)):
        print(f"[INFO] Loading {name}:", path)
        frames[name] = pd.read_csv(path)

    merged = merge_prediction_frames(frames["baseline"], frames["multimodal"], frames["AF"])

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    merged.to_csv(args.out_csv, index=False)
    print("[INFO] Saved merged CSV to:", args.out_csv)
    print("[INFO] merged shape:", merged.shape)


if __name__ == "__main__":
    main()
