#!/usr/bin/env python
# scripts/00_make_demo_pack.py
#
# Build a tiny, shareable demo pack (single-modal + multimodal) from PTB-XL.
# Deterministic selection given --seed: one positive per class + all-zero
# extras (reference: scripts/00_make_demo_pack.py:35-79).
# Output:
#   {out_root}/single/single_sample_*.npz      (ecg, y, classes)
#   {out_root}/multimodal/mm_sample_*.npz      (ecg, demo, y, classes)
#   {out_root}/meta.csv

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ptbxl_tpu.data import PTBXLDataset, PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def _y_to_str(y: np.ndarray) -> str:
    return ";".join(f"{CLASSES[i]}={int(y[i])}" for i in range(len(CLASSES)))


def _pick_indices_covering_classes(ds, max_per_class=1, extra_all_zero=1, seed=42):
    """One positive per class + some all-zero samples; deterministic."""
    rng = np.random.default_rng(seed)

    per_class = {c: [] for c in range(len(CLASSES))}
    all_zero = []
    y_all = ds.y  # [N, C] — direct access avoids decoding every record
    for i in range(len(ds)):
        y = y_all[i]
        if int(np.sum(y)) == 0:
            all_zero.append(i)
        for c in range(len(CLASSES)):
            if int(y[c]) == 1:
                per_class[c].append(i)

    chosen, chosen_for = [], {}
    for c in range(len(CLASSES)):
        pool = per_class[c]
        if not pool:
            continue
        rng.shuffle(pool)
        for idx in pool[:max_per_class]:
            if idx not in chosen:
                chosen.append(idx)
                chosen_for[idx] = f"pos_{CLASSES[c]}"

    if all_zero and extra_all_zero > 0:
        rng.shuffle(all_zero)
        for idx in all_zero[:extra_all_zero]:
            if idx not in chosen:
                chosen.append(idx)
                chosen_for[idx] = "all_zero"

    return chosen, chosen_for


def export_single(ds, out_dir, indices, chosen_for, meta_rows, prefix="single"):
    os.makedirs(out_dir, exist_ok=True)
    for k, idx in enumerate(indices):
        x, y = ds[idx]
        fname = f"{prefix}_sample_{k:02d}.npz"
        np.savez_compressed(
            os.path.join(out_dir, fname),
            ecg=x.astype(np.float32), y=y.astype(np.float32), classes=np.array(CLASSES),
        )
        meta_rows.append({
            "file": f"single/{fname}", "modality": "single",
            "index_in_split": int(idx), "chosen_for": chosen_for.get(idx, "unknown"),
            "y_true": _y_to_str(y), "y_sum": int(np.sum(y)),
            "ecg_shape": str(tuple(x.shape)),
        })


def export_multimodal(ds, out_dir, indices, chosen_for, meta_rows, prefix="mm"):
    os.makedirs(out_dir, exist_ok=True)
    for k, idx in enumerate(indices):
        x_ecg, x_demo, y = ds[idx]
        fname = f"{prefix}_sample_{k:02d}.npz"
        np.savez_compressed(
            os.path.join(out_dir, fname),
            ecg=x_ecg.astype(np.float32), demo=x_demo.astype(np.float32),
            y=y.astype(np.float32), classes=np.array(CLASSES),
        )
        meta_rows.append({
            "file": f"multimodal/{fname}", "modality": "multimodal",
            "index_in_split": int(idx), "chosen_for": chosen_for.get(idx, "unknown"),
            "y_true": _y_to_str(y), "y_sum": int(np.sum(y)),
            "ecg_shape": str(tuple(x_ecg.shape)), "demo_shape": str(tuple(x_demo.shape)),
        })


def main(args):
    set_seed(args.seed)

    out_root = args.out_root
    single_dir = os.path.join(out_root, "single")
    mm_dir = os.path.join(out_root, "multimodal")
    os.makedirs(single_dir, exist_ok=True)
    os.makedirs(mm_dir, exist_ok=True)

    ds_single = PTBXLDataset(args.base_dir, split="test", classes=CLASSES, normalize=args.normalize)
    ds_mm = PTBXLECGMultimodalDataset(args.base_dir, split="test", classes=CLASSES, normalize=args.normalize)
    print(f"[INFO] PTBXLDataset(test) size = {len(ds_single)}")
    print(f"[INFO] PTBXLECGMultimodalDataset(test) size = {len(ds_mm)}")

    idx_single, chosen_single = _pick_indices_covering_classes(
        ds_single, args.per_class, args.extra_all_zero, args.seed)
    idx_mm, chosen_mm = _pick_indices_covering_classes(
        ds_mm, args.per_class, args.extra_all_zero, args.seed)

    print(f"[INFO] Chosen single indices: {idx_single}")
    print(f"[INFO] Chosen multimodal indices: {idx_mm}")

    meta_rows = []
    export_single(ds_single, single_dir, idx_single, chosen_single, meta_rows)
    export_multimodal(ds_mm, mm_dir, idx_mm, chosen_mm, meta_rows)

    meta_path = os.path.join(out_root, "meta.csv")
    pd.DataFrame(meta_rows).to_csv(meta_path, index=False)
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
    args = parser.parse_args()
    main(args)
