#!/usr/bin/env python
# scripts/17_plot_mm_only.py — multimodal-only per-class ROC/PR and MI
# distribution.  Library backend: ptbxl_tpu/analysis/figures.py
# (reference: scripts/17).

import os
import sys
from pathlib import Path

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

from ptbxl_tpu.analysis.figures import ORANGE, render_single_model_figures  # noqa: E402


def main():
    merged_csv = Path("outputs/merged/test_03_04_05_merged.csv")
    out_dir = Path("outputs/figures")
    out_dir.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(merged_csv)
    print("[INFO] Loaded merged CSV:", df.shape)

    render_single_model_figures(
        df, out_dir,
        suffix="_mm",
        color=ORANGE,
        file_names={
            "roc": "mm_m1_per_class_roc.png",
            "pr": "mm_m2_per_class_pr.png",
            "mi": "mm_m3_mi_distribution.png",
        },
        titles={
            "roc": "Multimodal per-class ROC curves",
            "pr": "Multimodal per-class Precision-Recall curves",
            "mi": "Multimodal MI prediction distribution",
        },
        mi_labels=("MI = 1", "MI = 0"),
    )

    print("[INFO] Multimodal figures saved to:", out_dir.resolve())


if __name__ == "__main__":
    main()
