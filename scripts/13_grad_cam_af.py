#!/usr/bin/env python
# scripts/13_grad_cam_af.py
#
# Grad-CAM for the AF binary classifier (single logit, class index 0).
# Reference: scripts/13_grad_cam_af.py.

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptbxl_tpu.data import PTBXLAFDataset  # noqa: E402
from ptbxl_tpu.interpret.grad_cam import GradCAM  # noqa: E402
from ptbxl_tpu.interpret.plotting import plot_ecg_with_cam  # noqa: E402
from ptbxl_tpu.models.factory import load_ecgcnn  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402


def main(args):
    set_seed(42)
    print("[INFO] Device:", jax.devices()[0].platform)

    test_ds = PTBXLAFDataset(base_dir=args.base_dir, split="test", normalize="per_lead")
    print("[INFO] AF test size:", len(test_ds))

    # AF loads are strict (reference: scripts/13:141)
    model, variables, _ = load_ecgcnn(args.ckpt, num_labels=1, strict=True)

    x, y = test_ds[args.index]
    T = x.shape[-1]

    print(f"[INFO] Running AF Grad-CAM on sample {args.index} (y={float(y[0])})")

    gradcam = GradCAM(model, variables, signal_length=T, norm_first=False, eps=1e-9)
    _, cam = gradcam(jnp.asarray(x.T[None]), class_idx=0)
    cam = np.asarray(cam)[0]

    os.makedirs("outputs/gradcam_af", exist_ok=True)

    npy_path = os.path.join("outputs/gradcam_af", f"sample_{args.index}_AF_cam.npy")
    np.save(npy_path, cam)
    print("[SAVE] CAM saved to:", npy_path)

    fig_path = os.path.join("outputs/gradcam_af", f"sample_{args.index}_AF_plot.png")
    plot_ecg_with_cam(
        ecg=x, cam=cam, lead_idx=args.lead,
        title=f"AF Grad-CAM | sample {args.index} | AF label = {float(y[0])}",
        save_path=fig_path, figsize=(16, 4),
        xlabel="Time", ylabel=f"ECG Lead {args.lead}",
    )
    print(f"[SAVE] AF Grad-CAM saved to: {fig_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, default="data/ptb-xl/1.0.3")
    parser.add_argument("--ckpt", type=str, default="outputs/af_binary/ckpts/af_binary_best.npz")
    parser.add_argument("--index", type=int, default=10)
    parser.add_argument("--lead", type=int, default=0)
    args = parser.parse_args()
    main(args)
