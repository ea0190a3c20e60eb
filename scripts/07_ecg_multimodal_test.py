#!/usr/bin/env python
# scripts/07_ecg_multimodal_test.py
#
# Evaluate the multimodal model on the PTB-XL test split and dump predictions
# with the reference's `_mm`-suffixed column schema
# (reference: scripts/07_ecg_multimodal_test.py:123-130).
# Note: eval loss is the per-batch mean (loop_demo semantics).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ptbxl_tpu import config as C  # noqa: E402
from ptbxl_tpu.data import PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch  # noqa: E402
from ptbxl_tpu.models.factory import load_multimodal  # noqa: E402
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
        help="opt-in: additionally fit per-class F1 thresholds on the "
             "VALIDATION split and print the fitted test metrics alongside "
             "the fixed --threshold ones.  The reference declares this "
             "config key but never implements it (configs/base.yaml:23); "
             "the CSV y_pred_ columns stay at --threshold for parity.")
    args = parser.parse_args()

    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    data_cfg = cfg["data"]
    train_cfg = cfg["train"]
    model_cfg = C.model_cfg_multimodal(cfg)

    classes = C.get_classes(cfg)
    base_dir = C.get_base_dir(cfg)

    print(f"[INFO] Device: {jax.devices()[0].platform}")

    normalize = data_cfg.get("normalize", "per_lead")
    test_ds = PTBXLECGMultimodalDataset(base_dir, split="test", classes=classes, normalize=normalize)
    print("[ECG-MM] test size =", len(test_ds))

    assert os.path.exists(args.ckpt), f"Checkpoint not found: {args.ckpt}"
    model, variables, _ = load_multimodal(
        args.ckpt,
        num_labels=len(classes),
        ecg_feat_dim=model_cfg.get("ecg_feat_dim", 256),
        demo_hidden_dim=C.multimodal_hidden_dim(model_cfg),
        in_leads=model_cfg.get("in_leads", 12),
        strict=True,
    )
    print(f"[INFO] Loaded ECG-MM checkpoint: {args.ckpt}")

    state = create_train_state(model, variables, make_optimizer(0.0, 0.0))
    eval_step = make_eval_step(model, multimodal=True, normalize=normalize)
    src = BatchSource(test_ds, int(train_cfg.get("batch_size", 64)), shuffle=False)

    y_true, y_prob, avg_loss = predict_all(
        state, eval_step, device_prefetch(src.epoch(0)), loss_mode="per_batch"
    )

    metrics = compute_metrics(y_true, y_prob, threshold=args.threshold)
    metrics["bce_loss"] = avg_loss

    print("[ECG-MM][TEST] metrics:")
    for k, v in metrics.items():
        print(f"  {k}: {v}")

    if args.thresholds == "search_per_class":
        from ptbxl_tpu.training.thresholds import fit_on_val_report

        val_ds = PTBXLECGMultimodalDataset(base_dir, split="val",
                                           classes=classes,
                                           normalize=normalize)
        vsrc = BatchSource(val_ds, int(train_cfg.get("batch_size", 64)),
                           shuffle=False)
        yt_v, yp_v, _ = predict_all(state, eval_step,
                                    device_prefetch(vsrc.epoch(0)),
                                    loss_mode="per_batch")
        thr, fitted = fit_on_val_report(yt_v, yp_v, y_true, y_prob)
        print("[ECG-MM][TEST] val-fitted per-class thresholds:",
              {c: round(float(t), 4) for c, t in zip(classes, thr)})
        print("[ECG-MM][TEST] metrics @ val-fitted thresholds:")
        for k, v in fitted.items():
            print(f"  {k}: {v}")

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    df_dict = {}
    for i, cls in enumerate(classes):
        df_dict[f"y_true_{cls}"] = y_true[:, i].astype(int)
        df_dict[f"y_prob_{cls}_mm"] = y_prob[:, i]
        df_dict[f"y_pred_{cls}_mm"] = (y_prob[:, i] >= args.threshold).astype(int)
    pd.DataFrame(df_dict).to_csv(args.out_csv, index=False)

    print(f"[INFO] Saved ECG-MM test predictions to: {args.out_csv}")
    print("[INFO] Done.")


if __name__ == "__main__":
    main()
