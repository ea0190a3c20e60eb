"""Test-split loader factories (API parity with reference src/datasets/ptb_test.py).

The reference defines these but its scripts build loaders inline (SURVEY.md
§2.1); we keep the factory surface because it is part of the public API.
Each returns a (dataset, BatchSource) pair with shuffle=False.
"""

from __future__ import annotations

from typing import Dict, Tuple

from ptbxl_tpu.data.datasets import (
    PTBXLAFDataset,
    PTBXLDataset,
    PTBXLECGMultimodalDataset,
)
from ptbxl_tpu.data.pipeline import BatchSource


def _mk(config: Dict, ds) -> Tuple[object, BatchSource]:
    train_cfg = config["train"]
    return ds, BatchSource(ds, int(train_cfg["batch_size"]), shuffle=False)


def make_baseline_test_loader(config: Dict) -> Tuple[object, BatchSource]:
    data_cfg = config["data"]
    ds = PTBXLDataset(
        base_dir=data_cfg["base_dir"],
        split="test",
        classes=data_cfg["labels"],
        normalize=data_cfg.get("normalize", "per_lead"),
    )
    return _mk(config, ds)


def make_multimodal_test_loader(config: Dict) -> Tuple[object, BatchSource]:
    data_cfg = config["data"]
    ds = PTBXLECGMultimodalDataset(
        base_dir=data_cfg["base_dir"],
        split="test",
        classes=data_cfg["labels"],
        normalize=data_cfg.get("normalize", "per_lead"),
    )
    return _mk(config, ds)


def make_af_test_loader(config: Dict) -> Tuple[object, BatchSource]:
    data_cfg = config["data"]
    ds = PTBXLAFDataset(
        base_dir=data_cfg["base_dir"],
        split="test",
        normalize=data_cfg.get("normalize", "per_lead"),
    )
    return _mk(config, ds)
