#!/usr/bin/env python
# scripts/08_af_binary_test.py
#
# Evaluate the AF binary classifier on the PTB-XL test split and dump
# predictions with columns y_true_AF, y_prob_AF, y_pred_AF
# (reference: scripts/08_af_binary_test.py:124-135).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import pandas as pd  # noqa: E402

from ptbxl_tpu import config as C  # noqa: E402
from ptbxl_tpu.data import PTBXLAFDataset  # noqa: E402
from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch  # noqa: E402
from ptbxl_tpu.models.factory import load_ecgcnn  # noqa: E402
from ptbxl_tpu.training.loop import make_eval_step, predict_all  # noqa: E402
from ptbxl_tpu.training.metrics import compute_metrics  # noqa: E402
from ptbxl_tpu.training.train_state import create_train_state, make_optimizer  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out_csv", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument(
        "--thresholds", type=str, default=None, choices=["search_per_class"],
        help="opt-in: additionally fit the AF F1 threshold on the "
             "VALIDATION split and print the fitted test metrics alongside "
             "the fixed --threshold ones.  The reference declares this "
             "config key but never implements it (configs/base.yaml:23); "
             "the CSV y_pred_AF column stays at --threshold for parity.")
    args = parser.parse_args()

    print("[INFO] Running AF test script...")

    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    data_cfg = cfg["data"]
    train_cfg = cfg["train"]
    model_cfg = C.model_cfg_ecg(cfg)

    base_dir = C.get_base_dir(cfg)

    print(f"[INFO] Device: {jax.devices()[0].platform}")

    normalize = data_cfg.get("normalize", "per_lead")
    test_ds = PTBXLAFDataset(base_dir, split="test", normalize=normalize)
    print("[AF] Test size:", len(test_ds))

    assert os.path.exists(args.ckpt), f"Checkpoint not found: {args.ckpt}"
    model, variables, _ = load_ecgcnn(
        args.ckpt,
        num_labels=1,  # binary output
        feat_dim=model_cfg.get("feat_dim", 256),
        in_leads=model_cfg.get("in_leads", 12),
        strict=True,
    )
    print(f"[INFO] Loaded checkpoint: {args.ckpt}")

    state = create_train_state(model, variables, make_optimizer(0.0, 0.0))
    eval_step = make_eval_step(model, multimodal=False, normalize=normalize)
    src = BatchSource(test_ds, int(train_cfg["batch_size"]), shuffle=False)
    y_true, y_prob, bce = predict_all(state, eval_step, device_prefetch(src.epoch(0)))

    metrics = compute_metrics(y_true, y_prob, threshold=args.threshold)
    metrics["bce_loss"] = bce

    print("[AF][TEST] metrics:")
    for k, v in metrics.items():
        print(f"  {k}: {v}")

    if args.thresholds == "search_per_class":
        from ptbxl_tpu.training.thresholds import fit_on_val_report

        val_ds = PTBXLAFDataset(base_dir, split="val", normalize=normalize)
        vsrc = BatchSource(val_ds, int(train_cfg["batch_size"]), shuffle=False)
        yt_v, yp_v, _ = predict_all(state, eval_step,
                                    device_prefetch(vsrc.epoch(0)))
        thr, fitted = fit_on_val_report(yt_v, yp_v, y_true, y_prob)
        print("[AF][TEST] val-fitted threshold:", round(float(thr[0]), 4))
        print("[AF][TEST] metrics @ val-fitted threshold:")
        for k, v in fitted.items():
            print(f"  {k}: {v}")

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    y_true_flat = y_true.reshape(-1)
    y_prob_flat = y_prob.reshape(-1)
    pd.DataFrame(
        {
            "y_true_AF": y_true_flat.astype(int),
            "y_prob_AF": y_prob_flat,
            "y_pred_AF": (y_prob_flat >= args.threshold).astype(int),
        }
    ).to_csv(args.out_csv, index=False)

    print(f"[INFO] Saved AF test predictions to: {args.out_csv}")
    print("[INFO] Done.")


if __name__ == "__main__":
    main()
