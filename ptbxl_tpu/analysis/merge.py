"""Prediction-CSV merging (library backend for scripts/09).

Column-concatenates the three per-task prediction frames; ground-truth
columns are kept from the baseline frame only (reference: scripts/09:53-58),
and row counts must agree.  Verified to rebuild the reference's merged CSV
byte-for-value exactly (tests/test_fulldata_metrics_parity.py).
"""

from __future__ import annotations

import pandas as pd


def merge_prediction_frames(
    df_base: pd.DataFrame, df_mm: pd.DataFrame, df_af: pd.DataFrame
) -> pd.DataFrame:
    n = len(df_base)
    if len(df_mm) != n or len(df_af) != n:
        raise ValueError(
            f"Row count mismatch: baseline={len(df_base)}, multimodal={len(df_mm)}, AF={len(df_af)}"
        )
    mm_no_truth = df_mm[[c for c in df_mm.columns if not c.startswith("y_true_")]]
    # concat(axis=1) aligns on index — force positional alignment so a
    # filtered/shuffled index cannot silently reorder or NaN-pad rows
    return pd.concat(
        [df.reset_index(drop=True) for df in (df_base, mm_no_truth, df_af)],
        axis=1,
    )
