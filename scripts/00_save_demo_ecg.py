#!/usr/bin/env python
# scripts/00_save_demo_ecg.py — export a few test-split ECGs as .npy files.
# Library backend: ptbxl_tpu/data/demo_export.py (reference: scripts/00_save_demo_ecg.py).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.data.demo_export import export_npy_samples  # noqa: E402
from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(42)
    classes = [c.strip() for c in args.classes.split(",") if c.strip()] or ["MI", "STTC", "HYP", "CD", "NORM"]

    ds = PTBXLDataset(args.base_dir, split="test", classes=classes, normalize="per_lead")
    print(f"[INFO] PTBXLDataset(test) size = {len(ds)}")

    export_npy_samples(ds, args.out_dir, args.num_samples, multimodal=False)
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
    main(parser.parse_args())
