#!/usr/bin/env python
# scripts/14_plot_results.py — summary metrics + figures 14-17 from the
# merged predictions.  Library backend: ptbxl_tpu/analysis/figures.py
# (reference: scripts/14_plot_results.py).

import os
import sys
from pathlib import Path

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

from ptbxl_tpu.analysis.figures import render_summary_figures  # noqa: E402


def main():
    merged_path = Path("outputs/merged/test_03_04_05_merged.csv")
    out_dir = Path("outputs/figures")
    out_dir.mkdir(parents=True, exist_ok=True)

    print(f"[INFO] Loading merged results: {merged_path}")
    df = pd.read_csv(merged_path)
    print(f"[INFO] Shape: {df.shape}")

    render_summary_figures(df, out_dir)

    print("[INFO] Finished. All figures saved to:", out_dir.resolve())


if __name__ == "__main__":
    main()
