#!/usr/bin/env python
# scripts/11_grad_cam_ecg_baseline.py
#
# Batch Grad-CAM for the ECG baseline: pick a test-split sample, compute the
# CAM (library variant: normalize-then-interpolate, reference
# src/interpretability/grad_cam_1d.py), save .npy + info txt + overlay PNG
# with the 0.2 display threshold (reference: scripts/11:29).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptbxl_tpu import config as C  # noqa: E402
from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.interpret.grad_cam import GradCAM  # noqa: E402
from ptbxl_tpu.interpret.plotting import plot_ecg_with_cam  # noqa: E402
from ptbxl_tpu.models.factory import load_ecgcnn  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    print("[INFO] Device:", jax.devices()[0].platform)

    out_dir = "outputs/gradcam"
    os.makedirs(out_dir, exist_ok=True)

    data_cfg = cfg["data"]
    classes = C.get_classes(cfg)
    base_dir = C.get_base_dir(cfg)

    test_ds = PTBXLDataset(
        base_dir, split="test", classes=classes,
        normalize=data_cfg.get("normalize", "per_lead"),
    )
    print("[INFO] Test size:", len(test_ds))
    print("[INFO] Classes:", classes)

    # lenient load (reference: scripts/11:75, strict=False)
    model, variables, _ = load_ecgcnn(
        args.ckpt, num_labels=len(classes),
        in_leads=data_cfg.get("leads", 12), strict=False,
    )
    print("[INFO] Model loaded.")

    idx = args.index
    x, y = test_ds[idx]
    signal_length = x.shape[-1]

    if args.class_name:
        class_name = args.class_name
        class_idx = classes.index(class_name)
    else:
        class_idx = args.class_idx
        class_name = classes[class_idx]

    print(f"[INFO] Running Grad-CAM on sample {idx}, class {class_name}")

    grad_cam = GradCAM(model, variables, signal_length=signal_length, norm_first=True)
    _, cam = grad_cam(jnp.asarray(x.T[None]), class_idx=class_idx)
    cam = np.asarray(cam)[0]

    cam_save_path = os.path.join(out_dir, f"sample_{idx}_{class_name}_cam.npy")
    np.save(cam_save_path, cam)
    print(f"[SAVE] CAM saved to: {cam_save_path}")

    info_path = os.path.join(out_dir, f"sample_{idx}_{class_name}_info.txt")
    with open(info_path, "w") as f:
        f.write(f"Sample index: {idx}\n")
        f.write(f"Class: {class_name}\n")
        f.write(f"Class idx: {class_idx}\n")
        f.write(f"ECG shape: {tuple(x.shape)}\n")
        f.write(f"CAM shape: {cam.shape}\n")
    print(f"[SAVE] Info saved to: {info_path}")

    plot_path = os.path.join(out_dir, f"sample_{idx}_{class_name}_plot.png")
    plot_ecg_with_cam(
        ecg=x, cam=cam, lead_idx=args.lead,
        title=f"Grad-CAM | sample {idx} | class {class_name}",
        save_path=plot_path, guard_norm=True, threshold=0.2,
    )
    print(f"[SAVE] Heatmap saved to: {plot_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/ecg_baseline.yaml")
    parser.add_argument("--ckpt", type=str,
                        default="outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--lead", type=int, default=0)
    parser.add_argument("--class_idx", type=int, default=0)
    parser.add_argument("--class_name", type=str, default=None)
    main(parser.parse_args())
