#!/usr/bin/env python
# scripts/00_make_demo_pack.py — build the shareable demo pack from PTB-XL.
# Deterministic class-covering selection; library backend:
# ptbxl_tpu/data/demo_export.py (reference: scripts/00_make_demo_pack.py).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data import PTBXLDataset, PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.data.demo_export import (  # noqa: E402
    CLASSES,
    export_npz_samples,
    pick_demo_indices,
    write_meta,
)
from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(args.seed)

    single_dir = os.path.join(args.out_root, "single")
    mm_dir = os.path.join(args.out_root, "multimodal")
    os.makedirs(single_dir, exist_ok=True)
    os.makedirs(mm_dir, exist_ok=True)

    ds_single = PTBXLDataset(args.base_dir, split="test", classes=CLASSES, normalize=args.normalize)
    ds_mm = PTBXLECGMultimodalDataset(args.base_dir, split="test", classes=CLASSES, normalize=args.normalize)
    print(f"[INFO] PTBXLDataset(test) size = {len(ds_single)}")
    print(f"[INFO] PTBXLECGMultimodalDataset(test) size = {len(ds_mm)}")

    idx_single, why_single = pick_demo_indices(ds_single.y, args.per_class, args.extra_all_zero, args.seed)
    idx_mm, why_mm = pick_demo_indices(ds_mm.y, args.per_class, args.extra_all_zero, args.seed)
    print(f"[INFO] Chosen single indices: {idx_single}")
    print(f"[INFO] Chosen multimodal indices: {idx_mm}")

    meta_rows = []
    export_npz_samples(ds_single, single_dir, idx_single, why_single, meta_rows,
                       prefix="single", multimodal=False)
    export_npz_samples(ds_mm, mm_dir, idx_mm, why_mm, meta_rows,
                       prefix="mm", multimodal=True)

    meta_path = write_meta(meta_rows, args.out_root)
    print(f"[SAVE] meta.csv -> {meta_path}")
    print("[DONE] Demo pack created.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, required=True, help="PTB-XL base directory.")
    parser.add_argument("--out_root", type=str, default="data/demo", help="Output root directory.")
    parser.add_argument("--normalize", type=str, default="per_lead", help="Normalization mode.")
    parser.add_argument("--seed", type=int, default=42, help="Random seed.")
    parser.add_argument("--per_class", type=int, default=1, help="How many positive samples per class.")
    parser.add_argument("--extra_all_zero", type=int, default=2, help="Extra all-zero (normal-ish) samples.")
    main(parser.parse_args())
