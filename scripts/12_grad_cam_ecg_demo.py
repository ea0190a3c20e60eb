#!/usr/bin/env python
# scripts/12_grad_cam_ecg_demo.py
#
# Grad-CAM + demographic-importance figure for the multimodal model.
# Reference quirk preserved: writes to outputs/gradcam_multimodal (the
# reference README says gradcam_demo but the code writes gradcam_multimodal,
# scripts/12:253 — we follow the code).

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
from ptbxl_tpu.data import PTBXLECGMultimodalDataset  # noqa: E402
from ptbxl_tpu.interpret.grad_cam import GradCAM, demo_importance  # noqa: E402
from ptbxl_tpu.interpret.plotting import plot_ecg_and_demo_importance  # noqa: E402
from ptbxl_tpu.models.factory import load_multimodal  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    cfg = C.load_config(args.config)
    set_seed(C.get_seed(cfg))

    print("[INFO] Device:", jax.devices()[0].platform)

    data_cfg = cfg["data"]
    model_cfg = C.model_cfg_multimodal(cfg)
    base_dir = C.get_base_dir(cfg)
    classes = C.get_classes(cfg)

    test_ds = PTBXLECGMultimodalDataset(
        base_dir, split="test", classes=classes,
        normalize=data_cfg.get("normalize", "per_lead"),
    )
    print("[INFO] ECG-MM test size:", len(test_ds))
    print("[INFO] Classes:", classes)

    model, variables, _ = load_multimodal(
        args.ckpt,
        num_labels=len(classes),
        ecg_feat_dim=model_cfg.get("ecg_feat_dim", 256),
        demo_hidden_dim=C.multimodal_hidden_dim(model_cfg),
        in_leads=data_cfg.get("leads", 12),
        strict=False,
    )
    print("[INFO] Model loaded.")

    idx = args.index
    x_ecg, x_demo, y = test_ds[idx]
    signal_length = x_ecg.shape[-1]

    x = jnp.asarray(x_ecg.T[None])
    d = jnp.asarray(x_demo[None])

    if args.class_name:
        class_name = args.class_name
        class_idx = classes.index(class_name)
    else:
        class_idx = args.class_idx
        class_name = classes[class_idx]

    print(f"[INFO] Grad-CAM on sample {idx}, class {class_name}")

    # script-12 variant: interpolate-then-normalize with eps 1e-8 (12:66-73)
    grad_cam = GradCAM(
        model, variables, signal_length=signal_length,
        norm_first=False, eps=1e-8, multimodal=True,
    )
    _, cam = grad_cam(x, class_idx=class_idx, x_demo=d)
    cam = np.asarray(cam)[0]

    importance = np.asarray(demo_importance(model, variables, x, d, class_idx=class_idx))
    demo_feature_names = ["age", "sex", "height", "weight", "pacemaker"]

    out_dir = "outputs/gradcam_multimodal"
    os.makedirs(out_dir, exist_ok=True)

    cam_path = os.path.join(out_dir, f"sample_{idx}_{class_name}_cam.npy")
    np.save(cam_path, cam)
    print("[INFO] Saved CAM to:", cam_path)

    fig_path = os.path.join(out_dir, f"sample_{idx}_{class_name}_ecg_mm.png")
    plot_ecg_and_demo_importance(
        ecg=x_ecg, cam=cam,
        demo_importance=importance,
        demo_feature_names=demo_feature_names,
        lead_idx=args.lead,
        title=f"ECG multimodal Grad-CAM | sample {idx} | class {class_name}",
        save_path=fig_path,
    )
    print(f"[INFO] Saved Grad-CAM figure to: {fig_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/ecg_multimodal.yaml",
                        help="Path to YAML config file.")
    parser.add_argument("--ckpt", type=str,
                        default="outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz")
    parser.add_argument("--index", type=int, default=10)
    parser.add_argument("--lead", type=int, default=0)
    parser.add_argument("--class_idx", type=int, default=0)
    parser.add_argument("--class_name", type=str, default="MI")
    main(parser.parse_args())
