"""Generate golden parity fixtures from the PyTorch reference.

Run once in an environment where /root/reference and torch are available:

    python tools/make_goldens.py

Produces, for each demo-pack sample (the reference's de-facto fixtures):
  tests/golden/golden_baseline.npz    probs [7,5], cam_demo [7,5000] (interp->norm,
                                      eps 1e-9), cam_library [7,5000] (norm->interp)
  tests/golden/golden_multimodal.npz  probs [7,5], cam [7,5000] (eps 1e-8),
                                      demo_importance [7,5]
  tests/golden/golden_af.npz          probs [7,1], cam [7,5000] (eps 1e-9)

Also converts the reference's released checkpoints to the native .npz format
under outputs/*/ckpts/ (the same default paths the CLI scripts use) and copies
the demo pack into data/demo/.

The Grad-CAM math here re-implements the reference algorithm (SURVEY.md §2.4)
independently in torch: hook the last Conv1d, backprop the class logit,
weights = time-mean of grads, cam = relu(sum_c w*A), then normalize/interp in
both orderings.  Tests then assert the JAX vjp implementation matches.
"""

import glob
import os
import shutil
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, REF)

from src.models.ecg_cnn import ECGCNN as TorchECGCNN  # noqa: E402
from src.models.ecg_multimodal import ECGMultimodal as TorchMM  # noqa: E402

from ptbxl_tpu.models.params_io import (  # noqa: E402
    read_pth,
    save_npz,
    torch_to_flax_ecgcnn,
    torch_to_flax_multimodal,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(HERE, "tests", "golden")


def load_torch_model(cls, ckpt_path, **kwargs):
    model = cls(**kwargs)
    ck = read_pth(ckpt_path)
    sd = {k: torch.from_numpy(v) for k, v in ck["model_state"].items()}
    model.load_state_dict(sd, strict=False)
    model.eval()
    return model


def last_conv(model):
    last = None
    for m in model.modules():
        if isinstance(m, torch.nn.Conv1d):
            last = m
    return last


def torch_gradcam(model, inputs, class_idx, signal_length, norm_first, eps):
    """Independent torch Grad-CAM (both normalization orderings)."""
    acts, grads = {}, {}
    layer = last_conv(model)
    h1 = layer.register_forward_hook(lambda m, i, o: acts.update(a=o.detach()))
    h2 = layer.register_full_backward_hook(lambda m, gi, go: grads.update(g=go[0].detach()))
    model.zero_grad()
    logits = model(*inputs)
    logits[:, class_idx].sum().backward()
    h1.remove(), h2.remove()

    a, g = acts["a"], grads["g"]
    w = g.mean(dim=-1, keepdim=True)
    cam = F.relu((w * a).sum(dim=1))  # [1, T']

    def interp(c):
        return F.interpolate(c.unsqueeze(1), size=signal_length, mode="linear", align_corners=False).squeeze(1)

    if norm_first:
        cam = cam - cam.min()
        if cam.max() > 0:
            cam = cam / cam.max()
        cam = interp(cam)
    else:
        cam = interp(cam)
        cam = cam - cam.min()
        cam = cam / (cam.max() + eps)
    return cam[0].numpy(), torch.sigmoid(logits).detach()[0].numpy()


def main():
    os.makedirs(GOLD, exist_ok=True)

    singles = sorted(glob.glob(f"{REF}/data/demo/single/*.npz"))
    mms = sorted(glob.glob(f"{REF}/data/demo/multimodal/*.npz"))

    # ---- baseline -----------------------------------------------------
    bl = load_torch_model(
        TorchECGCNN, f"{REF}/outputs/ecg_baseline/ckpts/ecg_baseline_best.pth",
        in_leads=12, feat_dim=256, num_labels=5,
    )
    probs, cam_demo, cam_lib = [], [], []
    for f in singles:
        z = np.load(f, allow_pickle=True)
        x = torch.from_numpy(z["ecg"][None])
        c_demo, p = torch_gradcam(bl, (x,), 0, 5000, norm_first=False, eps=1e-9)
        c_lib, _ = torch_gradcam(bl, (x,), 0, 5000, norm_first=True, eps=0.0)
        probs.append(p), cam_demo.append(c_demo), cam_lib.append(c_lib)
    np.savez(
        os.path.join(GOLD, "golden_baseline.npz"),
        files=np.array([os.path.basename(f) for f in singles]),
        probs=np.stack(probs), cam_demo=np.stack(cam_demo), cam_library=np.stack(cam_lib),
    )
    print("[golden] baseline done")

    # ---- multimodal ----------------------------------------------------
    mm = load_torch_model(
        TorchMM, f"{REF}/outputs/ecg_multimodal/ckpts/ecg_multimodal_best.pth",
        num_labels=5, ecg_feat_dim=256, demo_hidden_dim=64,
    )
    probs, cams, imps = [], [], []
    for f in mms:
        z = np.load(f, allow_pickle=True)
        x = torch.from_numpy(z["ecg"][None])
        d = torch.from_numpy(z["demo"][None])
        c, p = torch_gradcam(mm, (x, d), 0, 5000, norm_first=False, eps=1e-8)
        # demographic grad x input importance (reference: scripts/12:78-97)
        d_req = d.clone().requires_grad_(True)
        mm.zero_grad()
        mm(x, d_req)[:, 0].sum().backward()
        imp = np.abs((d_req.grad[0] * d[0]).numpy())
        if imp.max() > 0:
            imp = imp / imp.max()
        probs.append(p), cams.append(c), imps.append(imp)
    np.savez(
        os.path.join(GOLD, "golden_multimodal.npz"),
        files=np.array([os.path.basename(f) for f in mms]),
        probs=np.stack(probs), cam=np.stack(cams), demo_importance=np.stack(imps),
    )
    print("[golden] multimodal done")

    # ---- AF -------------------------------------------------------------
    af = load_torch_model(
        TorchECGCNN, f"{REF}/outputs/af_binary/ckpts/af_binary_best.pth",
        in_leads=12, feat_dim=256, num_labels=1,
    )
    probs, cams = [], []
    for f in singles:
        z = np.load(f, allow_pickle=True)
        x = torch.from_numpy(z["ecg"][None])
        c, p = torch_gradcam(af, (x,), 0, 5000, norm_first=False, eps=1e-9)
        probs.append(p), cams.append(c)
    np.savez(
        os.path.join(GOLD, "golden_af.npz"),
        files=np.array([os.path.basename(f) for f in singles]),
        probs=np.stack(probs), cam=np.stack(cams),
    )
    print("[golden] AF done")

    # ---- converted checkpoints at the CLI default paths ------------------
    ck = read_pth(f"{REF}/outputs/ecg_baseline/ckpts/ecg_baseline_best.pth")
    save_npz(
        os.path.join(HERE, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz"),
        torch_to_flax_ecgcnn(ck["model_state"]), ck.get("classes"),
    )
    ck = read_pth(f"{REF}/outputs/ecg_multimodal/ckpts/ecg_multimodal_best.pth")
    save_npz(
        os.path.join(HERE, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz"),
        torch_to_flax_multimodal(ck["model_state"]), ck.get("classes"),
    )
    ck = read_pth(f"{REF}/outputs/af_binary/ckpts/af_binary_best.pth")
    save_npz(
        os.path.join(HERE, "outputs/af_binary/ckpts/af_binary_best.npz"),
        torch_to_flax_ecgcnn(ck["model_state"]), None,  # AF ckpt has no classes
    )
    print("[golden] converted checkpoints written under outputs/")

    # ---- demo pack copy ---------------------------------------------------
    for sub in ("single", "multimodal"):
        dst = os.path.join(HERE, "data", "demo", sub)
        os.makedirs(dst, exist_ok=True)
        for f in glob.glob(f"{REF}/data/demo/{sub}/*.npz"):
            shutil.copy(f, dst)
    for f in glob.glob(f"{REF}/data/demo/*.npy"):
        shutil.copy(f, os.path.join(HERE, "data", "demo"))
    if os.path.exists(f"{REF}/data/demo/meta.csv"):
        shutil.copy(f"{REF}/data/demo/meta.csv", os.path.join(HERE, "data", "demo"))
    print("[golden] demo pack copied")


if __name__ == "__main__":
    main()
