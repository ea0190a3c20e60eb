#!/usr/bin/env python
# scripts/printsize.py
#
# Print dataset split sizes for the baseline and multimodal datasets
# (reference: scripts/printsize.py — which hardcoded a Windows base_dir; here
# the path comes from --base_dir or the PTBXL_BASE_DIR environment variable).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data import PTBXLDataset, PTBXLECGMultimodalDataset  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--base_dir", type=str,
                    default=os.environ.get("PTBXL_BASE_DIR", "data/ptb-xl/1.0.3"))
args = parser.parse_args()

base_dir = args.base_dir
classes = ["MI", "STTC", "HYP", "CD", "NORM"]

print("=== Baseline datasets ===")
train_base = PTBXLDataset(base_dir=base_dir, split="train", classes=classes)
val_base = PTBXLDataset(base_dir=base_dir, split="val", classes=classes)
test_base = PTBXLDataset(base_dir=base_dir, split="test", classes=classes)

print("Baseline train size:", len(train_base))
print("Baseline val size:  ", len(val_base))
print("Baseline test size: ", len(test_base))

print("\n=== ECG + Demographics datasets ===")
train_mm = PTBXLECGMultimodalDataset(base_dir=base_dir, split="train", classes=classes)
val_mm = PTBXLECGMultimodalDataset(base_dir=base_dir, split="val", classes=classes)
test_mm = PTBXLECGMultimodalDataset(base_dir=base_dir, split="test", classes=classes)

print("ECG+Demo train size:", len(train_mm))
print("ECG+Demo val size:  ", len(val_mm))
print("ECG+Demo test size: ", len(test_mm))
