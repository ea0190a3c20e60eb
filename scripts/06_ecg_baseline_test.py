#!/usr/bin/env python
# scripts/06_ecg_baseline_test.py
#
# Evaluate the ECG baseline on the PTB-XL test split (strat_fold 10), print
# metrics, and dump the per-sample prediction CSV with the reference's column
# schema: y_true_{cls}, y_prob_{cls}, y_pred_{cls} per class
# (reference: scripts/06_ecg_baseline_test.py:121-130).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import pandas as pd  # noqa: E402

from ptbxl_tpu import config as C  # noqa: E402
from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
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
        help="opt-in: additionally fit per-class F1 thresholds on the "
             "VALIDATION split and print the fitted test metrics alongside "
             "the fixed --threshold ones.  The reference declares this "
             "config key but never implements it (configs/base.yaml:23); "
             "the CSV y_pred_ columns stay at --threshold for parity.")
    args = parser.parse_args()

    print("[DEBUG] running baseline test...")

    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    data_cfg = cfg["data"]
    train_cfg = cfg["train"]
    model_cfg = C.model_cfg_ecg(cfg)

    classes = C.get_classes(cfg)
    base_dir = C.get_base_dir(cfg)

    print(f"[INFO] Device: {jax.devices()[0].platform}")

    normalize = data_cfg.get("normalize", "per_lead")
    test_ds = PTBXLDataset(base_dir, split="test", classes=classes, normalize=normalize)
    print("[Baseline] test size =", len(test_ds))

    assert os.path.exists(args.ckpt), f"Checkpoint not found: {args.ckpt}"
    model, variables, _ = load_ecgcnn(
        args.ckpt,
        num_labels=len(classes),
        feat_dim=model_cfg.get("feat_dim", 256),
        in_leads=model_cfg.get("in_leads", 12),
        strict=True,  # test loads are strict (reference: scripts/06:81)
    )
    print(f"[INFO] Loaded ckpt: {args.ckpt}")

    state = create_train_state(model, variables, make_optimizer(0.0, 0.0))
    eval_step = make_eval_step(model, multimodal=False, normalize=normalize)
    src = BatchSource(test_ds, int(train_cfg["batch_size"]), shuffle=False)
    y_true, y_prob, bce = predict_all(state, eval_step, device_prefetch(src.epoch(0)))

    metrics = compute_metrics(y_true, y_prob, threshold=args.threshold)
    metrics["bce_loss"] = bce

    print("[Baseline][TEST] metrics:")
    for k, v in metrics.items():
        print(f"  {k}: {v}")

    if args.thresholds == "search_per_class":
        from ptbxl_tpu.training.thresholds import fit_on_val_report

        val_ds = PTBXLDataset(base_dir, split="val", classes=classes,
                              normalize=normalize)
        vsrc = BatchSource(val_ds, int(train_cfg["batch_size"]), shuffle=False)
        yt_v, yp_v, _ = predict_all(state, eval_step,
                                    device_prefetch(vsrc.epoch(0)))
        thr, fitted = fit_on_val_report(yt_v, yp_v, y_true, y_prob)
        print("[Baseline][TEST] val-fitted per-class thresholds:",
              {c: round(float(t), 4) for c, t in zip(classes, thr)})
        print("[Baseline][TEST] metrics @ val-fitted thresholds:")
        for k, v in fitted.items():
            print(f"  {k}: {v}")

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    df_dict = {}
    for i, name in enumerate(classes):
        df_dict[f"y_true_{name}"] = y_true[:, i].astype(int)
        df_dict[f"y_prob_{name}"] = y_prob[:, i]
        df_dict[f"y_pred_{name}"] = (y_prob[:, i] >= args.threshold).astype(int)
    pd.DataFrame(df_dict).to_csv(args.out_csv, index=False)

    print(f"[INFO] Saved baseline TEST preds to: {args.out_csv}")
    print("[INFO] Done.")


if __name__ == "__main__":
    main()
