#!/usr/bin/env python
# scripts/printsize.py — print split sizes for the baseline and multimodal
# datasets (reference: scripts/printsize.py, which hardcoded a Windows
# base_dir; here it comes from --base_dir / PTBXL_BASE_DIR).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data import PTBXLDataset, PTBXLECGMultimodalDataset  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def main(base_dir: str) -> None:
    print("=== Baseline datasets ===")
    sizes = {
        split: len(PTBXLDataset(base_dir=base_dir, split=split, classes=CLASSES))
        for split in ("train", "val", "test")
    }
    print("Baseline train size:", sizes["train"])
    print("Baseline val size:  ", sizes["val"])
    print("Baseline test size: ", sizes["test"])

    print("\n=== ECG + Demographics datasets ===")
    mm_sizes = {
        split: len(PTBXLECGMultimodalDataset(base_dir=base_dir, split=split, classes=CLASSES))
        for split in ("train", "val", "test")
    }
    print("ECG+Demo train size:", mm_sizes["train"])
    print("ECG+Demo val size:  ", mm_sizes["val"])
    print("ECG+Demo test size: ", mm_sizes["test"])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str,
                        default=os.environ.get("PTBXL_BASE_DIR", "data/ptb-xl/1.0.3"))
    main(parser.parse_args().base_dir)
