#!/usr/bin/env python
# scripts/15_plot_distributions.py — KDE probability-density figures.
# Library backend: ptbxl_tpu/analysis/figures.py (reference: scripts/15).

import os
import sys
from pathlib import Path

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

from ptbxl_tpu.analysis.figures import render_distribution_figures  # noqa: E402


def main():
    merged_csv = Path("outputs/merged/test_03_04_05_merged.csv")
    out_dir = Path("outputs/figures")
    out_dir.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(merged_csv)
    print("[INFO] Loaded merged CSV:", df.shape)

    render_distribution_figures(df, out_dir)

    print("[INFO] Distribution figures saved.")


if __name__ == "__main__":
    main()
