#!/usr/bin/env python
# scripts/03_train_ecg_baseline.py
#
# Train the single-modal ECG baseline on PTB-XL (TPU data-parallel).
# CLI, config schema, CSV schema, checkpoint selection, and print flow match
# the reference scripts/03_train_ecg_baseline.py; execution is a jitted JAX
# train step over the device mesh.

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402

from ptbxl_tpu import config as C  # noqa: E402
from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn, dtype_from_config  # noqa: E402
from ptbxl_tpu.training.trainer import TrainRun, train  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402

print("[INFO] Device (script import):", jax.devices()[0].platform)


def main(args):
    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    data_cfg = cfg["data"]
    train_cfg = cfg["train"]
    model_cfg = C.model_cfg_ecg(cfg)
    log_cfg = C.log_cfg(cfg)

    classes = C.get_classes(cfg)
    base_dir = C.get_base_dir(cfg)

    root_out = log_cfg.get("out_dir", "outputs")
    run_name = log_cfg.get("run_name", "ecg_baseline")
    out_dir = os.path.join(root_out, run_name)
    log_dir = os.path.join(out_dir, "logs")
    os.makedirs(log_dir, exist_ok=True)
    metrics_csv = os.path.join(log_dir, "metrics_ecg_baseline.csv")

    print("[INFO] Using config:", args.config)
    print("[INFO] Output dir:", out_dir)
    print("[INFO] Metrics CSV:", metrics_csv)

    normalize = data_cfg.get("normalize", "per_lead")
    train_ds = PTBXLDataset(base_dir, split="train", classes=classes, normalize=normalize)
    val_ds = PTBXLDataset(base_dir, split="val", classes=classes, normalize=normalize)

    print("[Baseline] train size =", len(train_ds))
    print("[Baseline] val size   =", len(val_ds))

    print("[INFO] Device (training):", jax.devices()[0].platform)

    model, variables = build_ecgcnn(
        in_leads=model_cfg.get("in_leads", 12),
        feat_dim=model_cfg.get("feat_dim", 256),
        num_labels=len(classes),
        seed=C.get_seed(cfg),
        precision=train_cfg.get("precision", "highest"),
        dtype=dtype_from_config(train_cfg.get("dtype", "float32")),
        torch_init=bool(model_cfg.get("torch_init", False)),
    )

    ckpt_dir = os.path.join(out_dir, "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(ckpt_dir, "ecg_baseline_best.npz")
    print("[INFO] Checkpoints ->", ckpt_path)

    run = TrainRun(
        model=model,
        variables=variables,
        train_ds=train_ds,
        val_ds=val_ds,
        batch_size=int(train_cfg["batch_size"]),
        epochs=int(train_cfg["epochs"]),
        lr=C.get_float(train_cfg, "lr", 1e-3),
        weight_decay=C.get_float(train_cfg, "weight_decay", 0.0),
        seed=C.get_seed(cfg),
        run_name=run_name,
        metrics_csv=metrics_csv,
        ckpt_path=ckpt_path,
        config_path=args.config,
        classes=classes,
        multimodal=False,
        loss_mode="per_sample",
        normalize=normalize,
        early_stop_patience=None,  # reference 03 ignores early_stop_patience
        arch="ecgcnn",
        train_print="Train BCE",
        val_print="Val metrics",
        best_print=lambda best, path: f"★ New best AUPRC: {best:.4f}",
        resume=args.resume,
        # large-batch recipe knobs (extension; dormant at defaults)
        warmup_steps=int(train_cfg.get("warmup_steps", 0)),
        lr_scaling=str(train_cfg.get("lr_scaling", "none")),
        ref_batch_size=int(train_cfg.get("ref_batch_size", 64)),
    )
    train(run)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/ecg_baseline.yaml")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the per-epoch Orbax checkpoint (extension).")
    args = parser.parse_args()
    main(args)
