"""YAML config handling with the reference's exact schema and fallback quirks.

The reference loads plain YAML dicts with ``yaml.safe_load`` and reads nested
keys with inline ``.get`` defaults (reference: scripts/03_train_ecg_baseline.py:63-74,
scripts/04_train_multimodal_prototype.py:70-104).  Quirks preserved here:

* ``model.ecg_multimodal`` falls back to ``model.ecg_demo``   (reference: scripts/04:74)
* ``demo_hidden_dim`` falls back to ``demo_feat_dim``          (reference: scripts/04:143-145)
* ``data.base_dir`` in the checked-in configs is a Windows path, so it must be
  user-overridable.  We additionally honor the ``PTBXL_BASE_DIR`` environment
  variable (an extension; the reference requires editing the YAML).
* Declared-but-dormant keys (``train.amp``, ``log.tb``,
  ``metrics.thresholds: search_per_class``) are accepted and ignored, matching
  the reference's behavior (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml

DEFAULT_CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config file into a plain dict (reference: scripts/06:22-24)."""
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"Config at {path} did not parse to a mapping: {type(cfg)}")
    return cfg


def get_seed(cfg: Dict[str, Any]) -> int:
    return int(cfg.get("seed", 42))


def get_classes(cfg: Dict[str, Any]) -> List[str]:
    """Class list with the reference default (reference: scripts/03:76)."""
    return list((cfg.get("data") or {}).get("labels", DEFAULT_CLASSES))


def get_base_dir(cfg: Dict[str, Any]) -> str:
    """data.base_dir, overridable via the PTBXL_BASE_DIR environment variable."""
    env = os.environ.get("PTBXL_BASE_DIR")
    if env:
        return env
    return cfg["data"]["base_dir"]


def get_normalize(cfg: Dict[str, Any]) -> str:
    return (cfg.get("data") or {}).get("normalize", "per_lead")


def model_cfg_ecg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """model.ecg section (reference: scripts/03:71)."""
    return ((cfg.get("model") or {}).get("ecg") or {})


def model_cfg_multimodal(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """model.ecg_multimodal with ecg_demo fallback (reference: scripts/04:74)."""
    model_all = cfg.get("model", {}) or {}
    return model_all.get("ecg_multimodal", model_all.get("ecg_demo", {})) or {}


def multimodal_hidden_dim(model_cfg: Dict[str, Any], default: int = 64) -> int:
    """demo_hidden_dim with demo_feat_dim fallback (reference: scripts/04:143-145)."""
    return int(model_cfg.get("demo_hidden_dim", model_cfg.get("demo_feat_dim", default)))


def train_cfg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    return cfg.get("train", {}) or {}


def log_cfg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    return cfg.get("log", {}) or {}


def get_float(section: Dict[str, Any], key: str, default: float) -> float:
    """YAML scalars like '1e-3' sometimes parse as strings; coerce like the
    reference's ``float(train_cfg.get("lr", 1e-3))`` (reference: scripts/03:131)."""
    return float(section.get(key, default))


def get_int(section: Dict[str, Any], key: str, default: int) -> int:
    return int(section.get(key, default))
