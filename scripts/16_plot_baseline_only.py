#!/usr/bin/env python
# scripts/16_plot_baseline_only.py — baseline-only per-class ROC/PR and MI
# distribution.  Library backend: ptbxl_tpu/analysis/figures.py
# (reference: scripts/16).

import os
import sys
from pathlib import Path

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

from ptbxl_tpu.analysis.figures import render_single_model_figures  # noqa: E402


def main():
    merged_csv = Path("outputs/merged/test_03_04_05_merged.csv")
    out_dir = Path("outputs/figures")
    out_dir.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(merged_csv)
    print("[INFO] Loaded merged CSV:", df.shape)

    render_single_model_figures(df, out_dir)  # baseline defaults

    print("[INFO] All baseline figures saved:", out_dir.resolve())


if __name__ == "__main__":
    main()
