#!/usr/bin/env python
# scripts/00_save_demo_multimodal.py
#
# Export ECG + demographic samples from the PTB-XL test split as .npy pairs
# (reference: scripts/00_save_demo_multimodal.py — whose `from datasets.`
# import was broken; fixed here).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

from ptbxl_tpu.data import PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(42)

    classes = args.classes.split(",") if args.classes else ["MI", "STTC", "HYP", "CD", "NORM"]

    ds = PTBXLECGMultimodalDataset(args.base_dir, split="test", classes=classes, normalize="per_lead")
    print(f"[INFO] PTBXLECGMultimodalDataset(test) size = {len(ds)}")

    os.makedirs(args.out_dir, exist_ok=True)

    n = min(args.num_samples, len(ds))
    for i in range(n):
        x_ecg, x_demo, y = ds[i]

        ecg_path = os.path.join(args.out_dir, f"demo_mm_ecg_{i}.npy")
        demo_path = os.path.join(args.out_dir, f"demo_mm_demo_{i}.npy")
        np.save(ecg_path, x_ecg)
        np.save(demo_path, x_demo)

        print(f"[SAVE] multimodal sample #{i}:")
        print(f"       ECG  -> {ecg_path}  shape={x_ecg.shape}")
        print(f"       DEMO -> {demo_path} shape={x_demo.shape}  y={y}")

    print("[DONE] Multimodal demo samples exported.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, required=True, help="PTB-XL base directory.")
    parser.add_argument("--out_dir", type=str, default="data/demo",
                        help="Directory to save demo files.")
    parser.add_argument("--num_samples", type=int, default=1,
                        help="Number of multimodal samples to export.")
    parser.add_argument("--classes", type=str, default="MI,STTC,HYP,CD,NORM",
                        help="Comma-separated class list.")
    args = parser.parse_args()
    main(args)
