#!/usr/bin/env python
"""Prototype: int8 PTQ forward for ECGCNN — accuracy vs f32 parity path.

Run with PTBXL_TPU_PLATFORM=cpu for accuracy; on TPU adds a timing row.
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.inference import Predictor  # noqa: E402
from ptbxl_tpu.models.params_io import load_checkpoint  # noqa: E402
from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_bn_into_conv  # noqa: E402
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch  # noqa: E402


def quantize_weights(folded, act_scales):
    """int8 weights with per-INPUT-channel activation scales folded in.

    Activation x[.., cin] is quantized per-channel (scale sx[cin]); the conv
    sum x_q*sx[cin]*w[k,cin,cout] folds sx into the weights BEFORE per-output
    -channel weight quantization, so per-channel act quant costs nothing.
    """
    q = {"n_blocks": folded["n_blocks"]}
    for i in range(folded["n_blocks"]):
        w = np.asarray(folded[f"w{i}"])  # [K, Cin, Cout]
        sx = np.asarray(act_scales[i])  # [Cin]
        wf = w * sx[None, :, None]
        s = np.abs(wf).max(axis=(0, 1)) / 127.0  # [Cout]
        s = np.maximum(s, 1e-12)
        q[f"w{i}"] = jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8)
        q[f"sw{i}"] = jnp.asarray(s, jnp.float32)
        q[f"sx{i}"] = jnp.asarray(sx, jnp.float32)
        q[f"b{i}"] = jnp.asarray(folded[f"b{i}"], jnp.float32)
    for name in ("proj", "head"):
        q[f"{name}_w"] = jnp.asarray(folded[f"{name}_w"], jnp.float32)
        q[f"{name}_b"] = jnp.asarray(folded[f"{name}_b"], jnp.float32)
    return q


def f32_layer_inputs(folded, x):
    """Run the folded f32 forward, returning each conv layer's input."""
    taps = [x]
    h = x
    for i in range(folded["n_blocks"]):
        w, b = folded[f"w{i}"], folded[f"b{i}"]
        y = jax.lax.conv_general_dilated(
            h, w, window_strides=(1,), padding=[(7, 7)],
            dimension_numbers=("NHC", "HIO", "NHC"), precision="highest",
        )
        h = jnp.maximum(y + b[None, None, :], 0.0)
        half = h.shape[1] // 2
        h = jnp.max(h[:, : 2 * half].reshape(h.shape[0], half, 2, h.shape[2]), axis=2)
        taps.append(h)
    return taps  # taps[i] is input to conv i; taps[-1] is GAP input


def calibrate(folded, x):
    """Per-input-channel absmax scales for every conv layer's input."""
    taps = f32_layer_inputs(folded, x)
    scales = []
    for i in range(folded["n_blocks"]):
        a = np.abs(np.asarray(taps[i]))  # [B, T, Cin]
        amax = a.max(axis=(0, 1))  # [Cin]
        scales.append(np.maximum(amax / 127.0, 1e-12).astype(np.float32))
    return scales


def make_int8_forward(q, epilogue_dtype=jnp.bfloat16, int8_layers=None, folded=None):
    """Mixed forward: layers in ``int8_layers`` run quant-int8, rest bf16."""
    n = q["n_blocks"]
    if int8_layers is None:
        int8_layers = set(range(n))

    @jax.jit
    def fwd(x):  # x [B, T, 12] raw
        h = zscore_per_lead_batch(x.astype(jnp.float32))
        for i in range(n):
            if i in int8_layers:
                xq = jnp.clip(jnp.round(h / q[f"sx{i}"]), -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, q[f"w{i}"], window_strides=(1,), padding=[(7, 7)],
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    preferred_element_type=jnp.int32,
                )
                hsc = y.astype(epilogue_dtype) * q[f"sw{i}"].astype(epilogue_dtype)
            else:
                y = jax.lax.conv_general_dilated(
                    h.astype(jnp.bfloat16),
                    folded[f"w{i}"].astype(jnp.bfloat16),
                    window_strides=(1,), padding=[(7, 7)],
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    preferred_element_type=jnp.float32,
                )
                hsc = y.astype(epilogue_dtype)
            h = jnp.maximum(hsc + q[f"b{i}"].astype(epilogue_dtype), 0.0)
            h = jax.lax.reduce_window(
                h, jnp.asarray(-jnp.inf, h.dtype), jax.lax.max,
                (1, 2, 1), (1, 2, 1), "VALID",
            )
        g = jnp.mean(h.astype(jnp.float32), axis=1)
        z = g @ q["proj_w"] + q["proj_b"]
        logits = z @ q["head_w"] + q["head_b"]
        return jax.nn.sigmoid(logits)

    return fwd


def main():
    variables, _ = load_checkpoint(
        "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz", arch="ecgcnn"
    )
    folded = fold_bn_into_conv(variables)
    folded = {k: (jnp.asarray(v, jnp.float32) if hasattr(v, "shape") else v)
              for k, v in folded.items()}

    ecgs = []
    for f in sorted(glob.glob("data/demo/single/*.npz")):
        d = np.load(f, allow_pickle=True)
        ecgs.append(d["ecg"].T)  # [12,T] -> [T,12]
    x = jnp.asarray(np.stack(ecgs), jnp.float32)

    pred = Predictor(variables, engine="xla", precision="highest")
    ref_probs = pred(np.stack(ecgs).transpose(0, 2, 1))

    # calibrate per-input-channel absmax on the z-scored demo ECGs
    xz = zscore_per_lead_batch(x)
    scales = calibrate(folded, xz)
    q = quantize_weights(folded, scales)
    for name, layers in [("all-int8", {0, 1, 2, 3}), ("L3-only", {3}), ("L23", {2, 3})]:
        fwd = make_int8_forward(q, int8_layers=layers, folded=folded)
        probs = np.asarray(fwd(x))
        d = np.abs(probs - ref_probs)
        print(f"{name:8s}: max|dprob|={d.max():.2e} mean={d.mean():.2e}")

    if jax.devices()[0].platform == "tpu":
        import bench as B_

        for B in (8192, 16384, 32768):
            xb = jax.block_until_ready(jax.jit(
                lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 5000, 12), jnp.bfloat16))())
            for name, layers in [("all-bf16", set()), ("L3 int8", {3})]:
                fwd = make_int8_forward(q, int8_layers=layers, folded=folded)
                try:
                    rps = B_._throughput(lambda v, x: fwd(x), None, xb)
                    print(f"{name:10s} bs={B}: {rps:,.0f} rec/s")
                except Exception as e:  # noqa: BLE001
                    print(f"{name:10s} bs={B}: FAIL {type(e).__name__}: {str(e)[:100]}")
            del xb


if __name__ == "__main__":
    main()
