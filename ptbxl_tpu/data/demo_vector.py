"""Demographic feature vector with the reference's exact clamp/fallback rules.

Reference: src/datasets/ptbxl_ecg_multimodal.py:106-164.  Vector is
``[age_norm, sex_id, height_norm, weight_norm, pacemaker]``:

* age: float() failure/non-finite/negative -> 0; >=300 -> 90; /100
* sex: "M" -> 0, "F" -> 1, anything else -> 0.5.  PTB-XL's sex column is
  NUMERIC (0/1), so real data always hits the else branch -> 0.5 (confirmed
  by the reference demo pack, where every sample has sex_id == 0.5).
* height: float() failure/non-finite/<=0 -> 0; /250
* weight: same with /200
* pacemaker: PTB-XL stores strings ("ja, pacemaker"), float() raises -> 0.0,
  so the feature is effectively always 0 (reference quirk, preserved).
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import numpy as np


def _safe_float(value: Any, default: float = 0.0) -> float:
    try:
        v = float(value)
    except Exception:
        return default
    if not math.isfinite(v):
        return default
    return v


def build_demo_vector(row: Mapping[str, Any]) -> np.ndarray:
    """row: mapping with age/sex/height/weight/pacemaker -> float32 [5]."""
    age = _safe_float(row.get("age", float("nan")))
    if age < 0:
        age = 0.0
    if age >= 300:
        age = 90.0
    age_norm = age / 100.0

    sex = row.get("sex", "UNKNOWN")
    if sex == "M":
        sex_id = 0.0
    elif sex == "F":
        sex_id = 1.0
    else:
        sex_id = 0.5

    height = _safe_float(row.get("height", float("nan")))
    if height <= 0:
        height = 0.0
    height_norm = height / 250.0

    weight = _safe_float(row.get("weight", float("nan")))
    if weight <= 0:
        weight = 0.0
    weight_norm = weight / 200.0

    pacemaker_val = _safe_float(row.get("pacemaker", 0))

    return np.array(
        [age_norm, sex_id, height_norm, weight_norm, pacemaker_val], dtype=np.float32
    )
