#!/usr/bin/env python
# scripts/00_save_demo_ecg.py
#
# Export a few PTB-XL ECG samples as .npy files for quick demonstrations
# (reference: scripts/00_save_demo_ecg.py).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(42)

    classes = args.classes.split(",") if args.classes else ["MI", "STTC", "HYP", "CD", "NORM"]

    ds = PTBXLDataset(args.base_dir, split="test", classes=classes, normalize="per_lead")
    print(f"[INFO] PTBXLDataset(test) size = {len(ds)}")

    os.makedirs(args.out_dir, exist_ok=True)

    n = min(args.num_samples, len(ds))
    for i in range(n):
        x, y = ds[i]
        save_path = os.path.join(args.out_dir, f"demo_ecg_{i}.npy")
        np.save(save_path, x)
        print(f"[SAVE] demo ECG #{i} -> {save_path} | y = {y}")

    print("[DONE] All demo ECG saved.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, required=True, help="PTB-XL base directory.")
    parser.add_argument("--out_dir", type=str, default="data/demo",
                        help="Directory to save demo npy files.")
    parser.add_argument("--num_samples", type=int, default=3,
                        help="Number of ECG files to export.")
    parser.add_argument("--classes", type=str, default="MI,STTC,HYP,CD,NORM",
                        help="Class list (comma-separated).")
    args = parser.parse_args()
    main(args)
