"""PTB-XL metadata and label construction (pure pandas/numpy, host-side).

Semantics match the reference exactly (src/utils/label_maps.py):

* ``load_metadata``      — read ptbxl_database.csv + scp_statements.csv and rename
  the first scp column to ``scp_code`` (reference: label_maps.py:9-29).
* ``build_label_matrix`` — scp_codes dict-string -> ast.literal_eval -> map each
  code through scp_statements.diagnostic_class -> multi-hot [N, C] float32.
  Unparseable / non-dict rows stay all-zero (reference: label_maps.py:56-68).
* ``build_af_binary_labels`` — AF=1 if any SCP code's description contains
  "atrial fibrillation" case-insensitively -> [N, 1] (reference: label_maps.py:84-112).

The row loop is vectorized differently from the reference (a comprehension over
``scp_codes`` strings rather than DataFrame.iterrows) but is observationally
identical, including silent all-zero on malformed entries.
"""

from __future__ import annotations

import ast
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd


def load_metadata(base_dir: str) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Load ptbxl_database.csv and scp_statements.csv; ensure 'scp_code' column."""
    db_path = os.path.join(base_dir, "ptbxl_database.csv")
    scp_path = os.path.join(base_dir, "scp_statements.csv")

    if not os.path.exists(db_path):
        raise FileNotFoundError(f"ptbxl_database.csv not found at: {db_path}")
    if not os.path.exists(scp_path):
        raise FileNotFoundError(f"scp_statements.csv not found at: {scp_path}")

    df = pd.read_csv(db_path)
    scp = pd.read_csv(scp_path)

    first_col = scp.columns[0]
    if first_col != "scp_code":
        scp = scp.rename(columns={first_col: "scp_code"})

    return df, scp


def _parse_scp_codes(raw) -> Optional[Dict]:
    """ast.literal_eval a scp_codes cell; None on any failure or non-dict.

    Matches the reference's try/except + isinstance(dict) guard
    (label_maps.py:57-62): malformed rows silently produce no labels.
    """
    try:
        codes = ast.literal_eval(raw)
    except Exception:
        return None
    if not isinstance(codes, dict):
        return None
    return codes


def build_label_matrix(
    df: pd.DataFrame,
    scp: pd.DataFrame,
    classes: List[str],
) -> np.ndarray:
    """Multi-hot [N, C] float32 over high-level diagnostic classes."""
    scp_map = scp.set_index("scp_code")
    if "diagnostic_class" not in scp_map.columns:
        raise KeyError("Column 'diagnostic_class' missing in scp_statements.csv.")
    code_to_class = scp_map["diagnostic_class"].to_dict()

    class_index = {cls: i for i, cls in enumerate(classes)}
    labels = np.zeros((len(df), len(classes)), dtype=np.float32)

    for i, raw in enumerate(df["scp_codes"].tolist()):
        codes = _parse_scp_codes(raw)
        if codes is None:
            continue
        for code in codes.keys():
            diag = code_to_class.get(code)
            if diag in class_index:
                labels[i, class_index[diag]] = 1.0

    return labels


def find_af_codes(scp: pd.DataFrame, keywords: Optional[List[str]] = None) -> List[str]:
    """SCP codes whose description contains any keyword, case-insensitive
    (reference: label_maps.py:84-96)."""
    if keywords is None:
        keywords = ["atrial fibrillation"]
    desc = scp["description"].astype(str).str.lower() if "description" in scp.columns else None
    if desc is None:
        raise KeyError("Column 'description' missing in scp_statements.csv.")
    mask = pd.Series(False, index=scp.index)
    for kw in keywords:
        # regex=False: keywords are literal substrings (metacharacters in
        # a keyword must not be interpreted)
        mask = mask | desc.str.contains(kw, na=False, regex=False)
    return scp.loc[mask, "scp_code"].tolist()


def build_af_binary_labels(
    df: pd.DataFrame,
    scp: pd.DataFrame,
    keywords: Optional[List[str]] = None,
) -> np.ndarray:
    """Binary AF labels [N, 1] float32 (reference: label_maps.py:72-112)."""
    af_codes = set(find_af_codes(scp, keywords))

    labels = np.zeros((len(df), 1), dtype=np.float32)
    for i, raw in enumerate(df["scp_codes"].tolist()):
        codes = _parse_scp_codes(raw)
        if codes is None:
            continue
        if any(code in af_codes for code in codes.keys()):
            labels[i, 0] = 1.0

    return labels
