"""Post-training int8 quantization for the ECG conv stack (inference only).

TPU-native rationale (measured on v5e, tools/probe_int8.py): XLA's conv
emitter engages the int8 MXU modes (~235 TOP/s at the deep-layer geometry vs
~151 TF/s bf16 in the same chained harness) even though Mosaic/Pallas does
not (docs/ARCHITECTURE.md).  Quantization is therefore an *XLA-path* feature.

Design (tools/proto_int8.py sweep + the v5e layer-set sweep below):

* **Mixed per-layer precision, default int8 on layers (1, 3).**  The
  MXU-saturated deep layer (128->256, T=625) is the big win; with
  requantization moved BEFORE the pool (see below) L1 joins it.  L2 is the
  odd one out — quantizing it is both slower AND the dominant accuracy cost
  (v5e, bs 12288, pre-pool requant: (1,3) 139.6k rec/s @ 3.2e-3;
  (3,) 129.2k @ 2.1e-3; (1,2,3) 132.4k but 6.3e-3 — breaches the 5e-3
  gate; all-bf16 ~100k).
* **Per-input-channel activation scales folded into the weights.**  The conv
  sum x_q[cin]*sx[cin]*w[k,cin,cout] lets sx fold into w *before* per-output
  -channel weight quantization, so per-channel activation quantization costs
  nothing at runtime.  Absmax calibration (no percentile clipping — the
  spiky tails of z-scored ECG carry signal; clipping was measured worse).
* BatchNorm is folded into conv weights first (inference running stats).
* Epilogue (dequant scale + bias + ReLU) stays bf16 elementwise; when the
  NEXT layer is int8 the requantization runs BEFORE the maxpool (max
  commutes with the monotone round/clip — byte-identical), so it fuses
  into the conv epilogue and the pool moves int8, not bf16.

Accuracy: the binding constraint is CALIBRATION COVERAGE, not the layer set
(round-3 battery finding).  The shipping default calibrates on the robust
synthetic preset (quant_eval.robust_calibration_signals — battery max
|dprob| ~0.030, gate-passing) and sits at ~1.6e-2 vs the f32 parity path on
the in-distribution demo pack (multimodal ~7e-3, AF ~1.9e-3).  Calibrating
on the demo pack instead tightens demo parity to ~3.2e-3 but fails the
battery out-of-distribution (max ~0.17) — available via
``calib_signals=demo_pack_signals()`` for strictly PTB-XL-like traffic.
Deeper layer sets breach the gates and are not used.

The reference has no quantization story at all (pure f32 torch inference,
/root/reference/scripts/06_ecg_baseline_test.py:94-106); this is a
framework-level capability addition.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ptbxl_tpu.ops.preprocess import (
    zscore_per_lead_batch,
    zscore_per_lead_batch_onepass,
)

# Default mixed-precision config: int8 only where it wins (see module doc).
# Per-arch: FiLM conditioning multiplies the backbone features, amplifying
# quantization error — the multimodal model breaches the 5e-3 gate with L1
# quantized (1.2e-2) and keeps the deep layer only.
DEFAULT_INT8_LAYERS: Tuple[int, ...] = (1, 3)  # ecgcnn / AF
_ARCH_DEFAULT_LAYERS = {"ecgcnn": (1, 3), "multimodal": (3,)}


def default_int8_layers(arch: str) -> Tuple[int, ...]:
    """The measured gate-passing winner for this architecture (v5e)."""
    return _ARCH_DEFAULT_LAYERS.get(arch, DEFAULT_INT8_LAYERS)


def folded_layer_inputs(folded: Dict[str, Any], x: jnp.ndarray) -> list:
    """f32 inputs of each conv layer of the BN-folded stack (calibration).

    ``x`` must already be z-scored if the serving path normalizes.
    Returns ``taps`` with ``taps[i]`` = input to conv ``i``.

    Jitted as ONE function: running this eagerly compiles each
    'highest'-precision conv as its own op — ~16 min cold on the TPU
    backend vs seconds for the single fused compile.
    """
    n_blocks = folded["n_blocks"]
    wb = {k: v for k, v in folded.items()
          if k[0] in "wb" and k[1:].isdigit()}

    @jax.jit
    def run(wb, x):
        taps = []
        h = x.astype(jnp.float32)
        for i in range(n_blocks):
            taps.append(h)
            w = jnp.asarray(wb[f"w{i}"], jnp.float32)
            b = jnp.asarray(wb[f"b{i}"], jnp.float32)
            y = jax.lax.conv_general_dilated(
                h, w, window_strides=(1,), padding=[(7, 7)],
                dimension_numbers=("NHC", "HIO", "NHC"), precision="highest",
            )
            h = jnp.maximum(y + b[None, None, :], 0.0)
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID"
            )
        taps.append(h)
        return tuple(taps)

    return list(run(wb, x))


def _validate_int8_layers(int8_layers: Sequence[int], n_blocks: int) -> None:
    """Loud error on out-of-range conv indices (e.g. --int8_layers 4 on a
    4-block net) instead of an opaque IndexError/KeyError during tracing."""
    bad = [i for i in int8_layers if not 0 <= int(i) < n_blocks]
    if bad:
        raise ValueError(
            f"int8_layers {bad} out of range: this stack has {n_blocks} conv "
            f"blocks (valid indices 0..{n_blocks - 1})"
        )


def calibrate_act_scales(
    folded: Dict[str, Any],
    x_calib: jnp.ndarray,
    int8_layers: Sequence[int] = DEFAULT_INT8_LAYERS,
) -> Dict[int, np.ndarray]:
    """Per-input-channel absmax scales for each int8 layer's input.

    ``x_calib``: [N, T, 12] z-scored calibration signals (channels-last).
    """
    _validate_int8_layers(int8_layers, folded["n_blocks"])
    need = set(int8_layers)
    taps = folded_layer_inputs(folded, x_calib)
    scales = {}
    for i in need:
        a = np.abs(np.asarray(taps[i]))  # [N, T, Cin]
        amax = a.max(axis=(0, 1))
        scales[i] = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    return scales


def quantize_folded(
    folded: Dict[str, Any],
    act_scales: Dict[int, np.ndarray],
    int8_layers: Sequence[int] = DEFAULT_INT8_LAYERS,
) -> Dict[str, Any]:
    """Quantize selected conv layers of a BN-folded param dict.

    Returns a new dict: int8 layers get ``w{i}`` int8 [K,Cin,Cout] (with the
    activation scale folded in), ``sw{i}`` f32 [Cout] dequant scales and
    ``sx{i}`` f32 [Cin] activation scales; other layers keep bf16 weights.
    Dense tails are passed through unchanged.
    """
    _validate_int8_layers(int8_layers, folded["n_blocks"])
    q: Dict[str, Any] = {"n_blocks": folded["n_blocks"],
                         "int8_layers": tuple(sorted(int8_layers))}
    for i in range(folded["n_blocks"]):
        w = np.asarray(folded[f"w{i}"], np.float32)
        b = np.asarray(folded[f"b{i}"], np.float32)
        if i in act_scales:
            sx = np.asarray(act_scales[i], np.float32)  # [Cin]
            wf = w * sx[None, :, None]
            sw = np.maximum(np.abs(wf).max(axis=(0, 1)) / 127.0, 1e-12)
            q[f"w{i}"] = jnp.asarray(
                np.clip(np.round(wf / sw), -127, 127), jnp.int8
            )
            q[f"sw{i}"] = jnp.asarray(sw, jnp.float32)
            q[f"sx{i}"] = jnp.asarray(sx, jnp.float32)
        else:
            q[f"w{i}"] = jnp.asarray(w, jnp.bfloat16)
        q[f"b{i}"] = jnp.asarray(b, jnp.float32)
    for k, v in folded.items():
        if k.endswith("_w") or k.endswith("_b"):
            q[k] = jnp.asarray(v, jnp.float32)
    return q


def _quantize_act(a: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(a.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)


def _conv_stack(
    q: Dict[str, Any], h: jnp.ndarray, n_blocks: int, int8_layers: Tuple[int, ...]
) -> jnp.ndarray:
    """Mixed int8/bf16 conv stack: h [B, T, 12] z-scored -> [B, T', C_last].

    When the NEXT layer is int8, requantization happens BEFORE the maxpool
    (round/clip are monotone, so max commutes — byte-identical results):
    the requant fuses into the conv epilogue and the pool moves int8, half
    the HBM traffic of pooling bf16 and requantizing in a separate pass.
    """
    for i in range(n_blocks):
        if i in int8_layers:
            xq = h if h.dtype == jnp.int8 else _quantize_act(h, q[f"sx{i}"])
            y = jax.lax.conv_general_dilated(
                xq, q[f"w{i}"], window_strides=(1,), padding=[(7, 7)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.int32,
            )
            hs = y.astype(jnp.bfloat16) * q[f"sw{i}"].astype(jnp.bfloat16)
        else:
            y = jax.lax.conv_general_dilated(
                h.astype(jnp.bfloat16), q[f"w{i}"].astype(jnp.bfloat16),
                window_strides=(1,), padding=[(7, 7)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )
            hs = y.astype(jnp.bfloat16)
        a = jnp.maximum(hs + q[f"b{i}"].astype(jnp.bfloat16), 0.0)
        if i + 1 in int8_layers:
            a = _quantize_act(a, q[f"sx{i + 1}"])
        h = jax.lax.reduce_window(
            a,
            jnp.asarray(jnp.iinfo(jnp.int8).min if a.dtype == jnp.int8 else -jnp.inf,
                        a.dtype),
            jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID",
        )
    return h


def split_meta(q: Dict[str, Any]) -> Tuple[Dict[str, Any], int, Tuple[int, ...]]:
    """Split a quantize_folded() dict into (array pytree, n_blocks, int8_layers)."""
    arrs = {k: v for k, v in q.items() if hasattr(v, "shape")}
    return arrs, q["n_blocks"], q["int8_layers"]


def make_quantized_forward(
    n_blocks: int,
    int8_layers: Tuple[int, ...],
    arch: str = "ecgcnn",
    normalize: bool = True,
):
    """Build ``fwd(arrs, x[, demo]) -> probs`` for the quantized stack.

    ``arrs`` is the array-only pytree from :func:`split_meta`; the static
    meta is bound here so the result is directly jittable.

    Normalization uses the one-pass moment form (E[x^2]-E[x]^2, f32): XLA
    fuses both reductions into a single HBM read, worth ~3% end-to-end at
    the headline batch (tools/probe_zscore.py: 144.0k vs 139.9k rec/s in
    -model; the Pallas alternatives LOSE — a [B,5000,12] custom-call
    operand forces the 10.7x lane-padded T(8,128) layout, and the lane
    -remap kernel's boundary reshapes are real copies).  Numerics vs the
    two-pass parity form differ by ~1e-6 in f32 — invisible under the demo
    -pack / battery gates.  Calibration (quantize_model) keeps the two-pass
    form: it is offline and stays byte-aligned with the parity oracle.
    """

    def ecg_z(q, h):
        g = jnp.mean(h.astype(jnp.float32), axis=1)
        return g @ q["proj_w"] + q["proj_b"]

    if arch == "multimodal":

        def fwd(q, x, demo):
            h = zscore_per_lead_batch_onepass(x) if normalize else x
            z = ecg_z(q, _conv_stack(q, h, n_blocks, int8_layers))
            d = jnp.asarray(demo, jnp.float32)
            e = jnp.maximum(d @ q["fc1_w"] + q["fc1_b"], 0.0)
            e = jnp.maximum(e @ q["fc2_w"] + q["fc2_b"], 0.0)
            film = e @ q["film_w"] + q["film_b"]
            gamma, beta = jnp.split(film, 2, axis=-1)
            z = (1.0 + jnp.tanh(gamma)) * z + beta
            logits = z @ q["head_w"] + q["head_b"]
            return jax.nn.sigmoid(logits)

    else:

        def fwd(q, x):
            h = zscore_per_lead_batch_onepass(x) if normalize else x
            z = ecg_z(q, _conv_stack(q, h, n_blocks, int8_layers))
            logits = z @ q["head_w"] + q["head_b"]
            return jax.nn.sigmoid(logits)

    return fwd


def demo_pack_signals(n: Optional[int] = None) -> np.ndarray:
    """Bundled demo-pack ECGs, [N, T, 12] — the *parity oracle*, not the
    default calibration set (see :func:`default_calib_signals`)."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    files = sorted(glob.glob(os.path.join(root, "data", "demo", "single", "*.npz")))
    if not files:
        raise FileNotFoundError(
            "no bundled demo pack found for int8 calibration; pass calib_signals"
        )
    ecgs = [np.load(f, allow_pickle=True)["ecg"].T for f in files[: n or len(files)]]
    return np.stack(ecgs).astype(np.float32)


def default_calib_signals() -> np.ndarray:
    """Default int8 calibration set: the ROBUST preset, [N, T, 12].

    Round-3 finding (ops/quant_eval.py battery, 519 signals): calibrating on
    the 7-record demo pack alone leaves out-of-distribution inputs with
    max |dprob| ~0.17 (decision flips deep past the 0.5 threshold the
    reference evaluates at, /root/reference/scripts/06_ecg_baseline_test.py:32),
    while the diverse synthetic preset bounds the whole battery at ~0.03 with
    only threshold-adjacent flips.  Calibration coverage — not the layer set —
    is the binding accuracy constraint, so the gate-passing robust preset IS
    the default; the demo pack remains available as the in-distribution
    parity oracle via :func:`demo_pack_signals` / ``calib_signals=...``.
    """
    from ptbxl_tpu.ops.quant_eval import robust_calibration_signals

    return np.ascontiguousarray(
        robust_calibration_signals().transpose(0, 2, 1))  # [N,12,T]->[N,T,12]


def _bias_correct_inplace(
    q: Dict[str, Any],
    folded: Dict[str, Any],
    taps,
    int8_layers: Sequence[int],
) -> None:
    """Per-output-channel mean-error bias correction (AdaQuant-style).

    For each quantized layer, the systematic component of the quantization
    error — E over the calibration set and time of (dequantized int8 conv −
    f32 conv) per output channel — is folded into the conv bias.  Computed
    per-layer on the f32 taps (not the compounded quantized activations),
    the standard cheap variant.  Measured effect on the (1,2,3) layer set is
    recorded in docs/ARCHITECTURE.md; the battery gate decides shipping.
    """

    @jax.jit
    def delta_for(x, wq, sw, sx, wf):
        xq = _quantize_act(x, sx)
        yq = jax.lax.conv_general_dilated(
            xq, wq, window_strides=(1,), padding=[(7, 7)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sw
        yf = jax.lax.conv_general_dilated(
            x, wf, window_strides=(1,), padding=[(7, 7)],
            dimension_numbers=("NHC", "HIO", "NHC"), precision="highest",
        )
        return jnp.mean(yq - yf, axis=(0, 1))  # [Cout]

    for i in sorted(int8_layers):
        delta = delta_for(
            jnp.asarray(taps[i], jnp.float32), q[f"w{i}"], q[f"sw{i}"],
            q[f"sx{i}"], jnp.asarray(folded[f"w{i}"], jnp.float32),
        )
        q[f"b{i}"] = jnp.asarray(
            np.asarray(q[f"b{i}"], np.float32) - np.asarray(delta, np.float32)
        )


def quantize_model(
    variables: Dict[str, Any],
    arch: str = "ecgcnn",
    calib_signals: Optional[np.ndarray] = None,
    int8_layers: Optional[Sequence[int]] = None,
    normalize: bool = True,
    bias_correct: bool = False,
) -> Dict[str, Any]:
    """One-call PTQ: fold BN, calibrate, quantize. Returns the q-param dict.

    ``calib_signals``: raw [N, 12, T] or [N, T, 12] signals; defaults to the
    robust synthetic preset (:func:`default_calib_signals` — the battery
    -gate-passing choice; pass :func:`demo_pack_signals` for the old
    in-distribution-only calibration).  They are z-scored iff the serving
    path normalizes.
    ``int8_layers`` defaults to the per-arch measured winner.
    ``bias_correct`` folds the calibration-set mean quantization error into
    the conv biases (see :func:`_bias_correct_inplace`).
    """
    from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_bn_into_conv, fold_multimodal

    if int8_layers is None:
        int8_layers = default_int8_layers(arch)
    fold = fold_multimodal if arch == "multimodal" else fold_bn_into_conv
    folded = fold(variables)

    x = np.asarray(
        calib_signals if calib_signals is not None else default_calib_signals(),
        np.float32,
    )
    if x.ndim == 2:
        x = x[None]
    if x.shape[1] == 12 and x.shape[2] != 12:
        x = x.transpose(0, 2, 1)
    xj = jnp.asarray(x)
    if normalize:
        xj = zscore_per_lead_batch(xj)
    _validate_int8_layers(int8_layers, folded["n_blocks"])
    need = set(int8_layers)
    taps = folded_layer_inputs(folded, xj)
    scales = {}
    for i in need:
        a = np.abs(np.asarray(taps[i]))
        amax = a.max(axis=(0, 1))
        scales[i] = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = quantize_folded(folded, scales, int8_layers)
    if bias_correct:
        _bias_correct_inplace(q, folded, taps, int8_layers)
    return q


def save_qparams(q: Dict[str, Any], path: str) -> str:
    """Persist a quantize_model() result to .npz (atomic write).

    Skips the fold+calibrate step at deployment startup (~70 s cold on TPU
    for the jitted 'highest' calibration forward): quantize once offline,
    ship the qparams next to the checkpoint.
    """
    arrs = {}
    bf16_keys = []
    for k, v in q.items():
        if not hasattr(v, "shape"):
            continue
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:  # npz degrades bf16 to void; store f32
            a = a.astype(np.float32)  # exact (bf16 ⊂ f32)
            bf16_keys.append(k)
        arrs[k] = a
    arrs["__n_blocks__"] = np.asarray(q["n_blocks"], np.int64)
    arrs["__int8_layers__"] = np.asarray(sorted(q["int8_layers"]), np.int64)
    arrs["__bf16_keys__"] = np.asarray(bf16_keys)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    import os

    os.replace(tmp, path)
    return path


def load_qparams(path: str) -> Dict[str, Any]:
    """Load a save_qparams() file back into a quantized-param dict."""
    with np.load(path, allow_pickle=False) as z:
        bf16_keys = {str(k) for k in z["__bf16_keys__"]}
        q: Dict[str, Any] = {
            "n_blocks": int(z["__n_blocks__"]),
            "int8_layers": tuple(int(i) for i in z["__int8_layers__"]),
        }
        for k in z.files:
            if k.startswith("__"):
                continue
            arr = z[k]
            q[k] = jnp.asarray(arr, jnp.bfloat16 if k in bf16_keys else None)
    return q
