#!/usr/bin/env python
# scripts/00_demo_inference.py
#
# Single-sample Grad-CAM demo on a bundled ECG, no PTB-XL required.
# Supports .npy ([12,T]) and .npz (ecg, y, classes) like the reference
# (scripts/00_demo_inference.py).  The forward + Grad-CAM is ONE jitted JAX
# function computed via jax.vjp (no hooks).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptbxl_tpu.interpret.grad_cam import GradCAM  # noqa: E402
from ptbxl_tpu.interpret.plotting import plot_ecg_with_cam  # noqa: E402
from ptbxl_tpu.models.factory import load_ecgcnn  # noqa: E402
from ptbxl_tpu.utils.rng import set_seed  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def load_demo_file(path: str):
    """Returns (ecg_np [12,T], y_true [5] or None, classes list)."""
    if path.endswith(".npy"):
        return np.load(path), None, CLASSES
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        ecg_np = z["ecg"]
        y_true = z["y"] if "y" in z.files else None
        classes = [str(c) for c in z["classes"]] if "classes" in z.files else CLASSES
        return ecg_np, y_true, classes
    raise ValueError(f"Unsupported demo file: {path}. Use .npy or .npz")


def main(args):
    set_seed(42)
    print("[INFO] Device:", jax.devices()[0].platform)

    ecg_np, y_true, classes = load_demo_file(args.demo_path)
    print("[INFO] Loaded demo ECG:", ecg_np.shape)

    T = ecg_np.shape[-1]
    x = jnp.asarray(ecg_np.T[None], dtype=jnp.float32)  # [1, T, 12] channels-last

    # lenient load like the reference demo path (scripts/00:118, strict=False)
    model, variables, _ = load_ecgcnn(args.ckpt, num_labels=len(CLASSES), strict=False)
    print("[INFO] Loaded baseline model.")

    class_idx = args.class_idx
    class_name = CLASSES[class_idx]

    # one jitted call returns (probs, cam): interp->norm with eps 1e-9,
    # matching the reference demo's GradCAM variant (scripts/00:39-61)
    gradcam = GradCAM(model, variables, signal_length=T, norm_first=False, eps=1e-9)
    probs, cam = gradcam(x, class_idx=class_idx)
    probs = np.asarray(probs)[0]
    cam = np.asarray(cam)[0]

    print("[INFO] Predicted probabilities:")
    for i, p in enumerate(probs):
        name = CLASSES[i] if i < len(CLASSES) else f"cls_{i}"
        print(f"  {name}: {p:.3f}")

    if y_true is not None:
        y_true = np.asarray(y_true).astype(np.float32)
        print("[INFO] Ground-truth labels:")
        for i in range(min(len(CLASSES), len(y_true))):
            print(f"  {CLASSES[i]}: {int(y_true[i])}")

    print(f"[INFO] Running Grad-CAM for class: {class_name} (index {class_idx})")

    os.makedirs("outputs/demo", exist_ok=True)
    base_name = os.path.splitext(os.path.basename(args.demo_path))[0]
    fig_path = os.path.join("outputs/demo", f"{base_name}_gradcam_{class_name}.png")

    title = f"Demo Grad-CAM | {base_name} | class {class_name}"
    if y_true is not None and class_idx < len(y_true):
        title += f" | GT={int(y_true[class_idx])}"

    plot_ecg_with_cam(ecg=ecg_np, cam=cam, lead_idx=args.lead, title=title, save_path=fig_path)
    print(f"[SAVE] Demo Grad-CAM figure saved to: {fig_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--demo_path", type=str, default="data/demo/single/single_sample_00.npz",
                        help="Path to demo ECG file (.npy or .npz).")
    parser.add_argument("--ckpt", type=str, default="outputs/ecg_baseline/ckpts/ecg_baseline_best.npz",
                        help="Path to baseline ECG checkpoint (.npz or reference .pth).")
    parser.add_argument("--class_idx", type=int, default=0, help="Class index (0..4).")
    parser.add_argument("--lead", type=int, default=0, help="Lead index to plot (0..11).")
    args = parser.parse_args()
    main(args)
