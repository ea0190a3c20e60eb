#!/usr/bin/env python
# scripts/00_save_demo_multimodal.py — export ECG + demographics .npy pairs.
# Library backend: ptbxl_tpu/data/demo_export.py (reference:
# scripts/00_save_demo_multimodal.py, whose `from datasets.` import was
# broken; fixed here).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data import PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.data.demo_export import export_npy_samples  # noqa: E402
from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(42)
    classes = [c.strip() for c in args.classes.split(",") if c.strip()] or ["MI", "STTC", "HYP", "CD", "NORM"]

    ds = PTBXLECGMultimodalDataset(args.base_dir, split="test", classes=classes, normalize="per_lead")
    print(f"[INFO] PTBXLECGMultimodalDataset(test) size = {len(ds)}")

    export_npy_samples(ds, args.out_dir, args.num_samples, multimodal=True)
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
    main(parser.parse_args())
