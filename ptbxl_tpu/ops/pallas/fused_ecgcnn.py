"""Fully-fused single-kernel ECGCNN inference (Pallas/Mosaic).

The reference runs Conv1d/BN/ReLU/MaxPool as separate cuDNN/ATen ops
(reference: src/models/ecg_cnn.py:12-17).  Here the ENTIRE inference forward
— per-lead z-score, four conv(k=15)+BN+ReLU+maxpool(2) blocks, global average
pool, projection, and classification head — executes as ONE Pallas kernel per
sample with every activation resident in VMEM:

* grid = (B,): one program per record; all intermediates ([5014,12] ->
  [312,256], ~2 MB peak) stay on-chip, so HBM traffic is one signal read +
  5 floats out, vs ~10 activation round-trips on the op-by-op path.
* BatchNorm is folded into the conv weights at trace time (inference-only):
  w' = w * scale/sqrt(var+eps), b' = (b-mean)*scale/sqrt(var+eps)+bias.
* conv(k=15, SAME) is computed as 15 shifted [T,Cin]x[Cin,Cout] MXU matmuls
  accumulating in f32 (optionally with bf16 inputs for MXU rate).
* maxpool(2) floors odd lengths exactly like torch (625 -> 312).

Numerics: with compute_dtype=float32 + highest precision this matches the
XLA parity path to ~1e-5 probs; bf16 inputs trade ~1e-3 prob error for MXU
throughput (both gated in bench.py against the demo-pack parity check).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptbxl_tpu.ops.pallas.zscore import zscore_tile

BN_EPS = 1e-5
ZS_EPS = 1e-6
K = 15
PAD = K // 2


def fold_bn_into_conv(variables: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Fold BatchNorm running stats into conv weights/biases (inference)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {}
    i = 0
    while f"blocks_{i}" in params:
        p = params[f"blocks_{i}"]
        s = stats[f"blocks_{i}"]["bn"]
        inv = p["bn"]["scale"] / np.sqrt(np.asarray(s["var"]) + BN_EPS)
        out[f"w{i}"] = jnp.asarray(p["conv"]["kernel"] * inv[None, None, :])
        out[f"b{i}"] = jnp.asarray(
            (p["conv"]["bias"] - s["mean"]) * inv + p["bn"]["bias"]
        )
        i += 1
    out["n_blocks"] = i
    for name in ("proj", "head"):  # head absent for ECGBackbone subtrees
        if name in params:
            out[f"{name}_w"] = jnp.asarray(params[name]["kernel"])
            out[f"{name}_b"] = jnp.asarray(params[name]["bias"])
    return out


def _conv_block(x, w, b, compute_dtype):
    """x [T+14, Cin] (already padded) -> relu(conv+b) pooled [T//2, Cout]."""
    t_out = x.shape[0] - 2 * PAD
    cout = w.shape[2]
    acc = jnp.zeros((t_out, cout), dtype=jnp.float32)
    xc = x.astype(compute_dtype)
    wc = w.astype(compute_dtype)
    for k in range(K):
        acc += jax.lax.dot_general(
            xc[k : k + t_out, :],
            wc[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    h = jnp.maximum(acc + b[None, :].astype(jnp.float32), 0.0)
    half = t_out // 2  # torch MaxPool1d(2) floors odd lengths
    h = h[: 2 * half].reshape(half, 2, cout)
    return jnp.max(h, axis=1)


def _pad_t(x):
    return jnp.pad(x, ((PAD, PAD), (0, 0)))


def _make_kernel(n_blocks: int, compute_dtype, normalize: bool):
    def kernel(x_ref, *refs):
        w_refs = refs[: 2 * n_blocks]
        proj_w_ref, proj_b_ref, head_w_ref, head_b_ref, o_ref = refs[2 * n_blocks :]

        x = x_ref[0]  # [T, 12] f32
        if normalize:
            x = zscore_tile(x)

        h = x
        for i in range(n_blocks):
            w = w_refs[2 * i][...]
            b = w_refs[2 * i + 1][...]
            h = _conv_block(_pad_t(h), w, b, compute_dtype)

        # GAP as a ones-vector matmul: avoids a cross-sublane reduction
        # relayout (Mosaic limitation) and rides the MXU
        ones = jnp.full((1, h.shape[0]), 1.0 / h.shape[0], dtype=jnp.float32)
        g = jax.lax.dot_general(
            ones, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, C]
        z = (
            jax.lax.dot_general(
                g.astype(compute_dtype),
                proj_w_ref[...].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + proj_b_ref[...][None, :]
        )
        logits = (
            jax.lax.dot_general(
                z.astype(compute_dtype),
                head_w_ref[...].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + head_b_ref[...][None, :]
        )
        # output tile padded to (8, 128) to satisfy TPU tiling; row 0 holds logits
        if logits.shape[1] > 128:
            raise ValueError("fused kernels support num_labels <= 128")
        o_ref[0] = jnp.pad(logits, ((0, 7), (0, 128 - logits.shape[1])))

    return kernel


def fused_ecgcnn_logits(
    x: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    compute_dtype=jnp.float32,
    normalize: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, 12] raw signals -> logits [B, num_labels].

    ``folded`` from fold_bn_into_conv.  ``normalize`` applies the in-kernel
    per-lead z-score (set False if inputs are pre-normalized).
    """
    n_blocks = int(folded["n_blocks"])
    weights = {k: v for k, v in folded.items() if k != "n_blocks"}
    return _fused_logits_jit(x, weights, n_blocks, compute_dtype, normalize, interpret)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "normalize", "interpret")
)
def _fused_logits_jit(
    x: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    n_blocks: int,
    compute_dtype,
    normalize: bool,
    interpret: bool,
) -> jnp.ndarray:
    b, t, c_in = x.shape
    num_labels = folded["head_b"].shape[0]

    weight_args = []
    in_specs = [pl.BlockSpec((1, t, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]

    def const_spec(arr):
        nd = arr.ndim
        zeros = (0,) * nd
        return pl.BlockSpec(arr.shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    for i in range(n_blocks):
        for key in (f"w{i}", f"b{i}"):
            weight_args.append(folded[key])
            in_specs.append(const_spec(folded[key]))
    for key in ("proj_w", "proj_b", "head_w", "head_b"):
        weight_args.append(folded[key])
        in_specs.append(const_spec(folded[key]))

    kernel = _make_kernel(n_blocks, compute_dtype, normalize)

    flops_per_sample = 0
    t_cur = t
    for i in range(n_blocks):
        w = folded[f"w{i}"]
        flops_per_sample += 2 * K * w.shape[1] * w.shape[2] * t_cur
        t_cur //= 2

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_sample,
            bytes_accessed=b * t * c_in * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *weight_args)
    return out[:, 0, :num_labels]


def fused_ecgcnn_probs(x, folded, compute_dtype=jnp.float32, normalize=True, interpret=False):
    return jax.nn.sigmoid(
        fused_ecgcnn_logits(x, folded, compute_dtype, normalize, interpret)
    )


# ---------------------------------------------------------------------------
# Multimodal variant: ECG backbone + demographics MLP + FiLM + head, fused
# ---------------------------------------------------------------------------


def fold_multimodal(variables: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Fold the multimodal model for the fused kernel (BN into convs)."""
    p = variables["params"]
    bb = {"params": p["ecg_backbone"], "batch_stats": variables["batch_stats"]["ecg_backbone"]}
    out = fold_bn_into_conv({"params": bb["params"], "batch_stats": bb["batch_stats"]})
    # fold_bn_into_conv read proj/head from the backbone subtree; backbone has
    # proj but no head — rebuild the dense tail explicitly
    out.pop("head_w", None)
    out.pop("head_b", None)
    out["proj_w"] = jnp.asarray(p["ecg_backbone"]["proj"]["kernel"])
    out["proj_b"] = jnp.asarray(p["ecg_backbone"]["proj"]["bias"])
    out["fc1_w"] = jnp.asarray(p["demo_encoder"]["fc1"]["kernel"])
    out["fc1_b"] = jnp.asarray(p["demo_encoder"]["fc1"]["bias"])
    out["fc2_w"] = jnp.asarray(p["demo_encoder"]["fc2"]["kernel"])
    out["fc2_b"] = jnp.asarray(p["demo_encoder"]["fc2"]["bias"])
    out["film_w"] = jnp.asarray(p["film_gen"]["kernel"])
    out["film_b"] = jnp.asarray(p["film_gen"]["bias"])
    out["head_w"] = jnp.asarray(p["head"]["kernel"])
    out["head_b"] = jnp.asarray(p["head"]["bias"])
    return out


_MM_DENSE_KEYS = (
    "proj_w", "proj_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    "film_w", "film_b", "head_w", "head_b",
)


def _dot1(v, w, compute_dtype):
    return jax.lax.dot_general(
        v.astype(compute_dtype), w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_mm_kernel(n_blocks: int, compute_dtype, normalize: bool):
    def kernel(x_ref, d_ref, *refs):
        w_refs = refs[: 2 * n_blocks]
        dense = refs[2 * n_blocks : 2 * n_blocks + len(_MM_DENSE_KEYS)]
        o_ref = refs[-1]
        (proj_w, proj_b, fc1_w, fc1_b, fc2_w, fc2_b,
         film_w, film_b, head_w, head_b) = [r[...] for r in dense]

        x = x_ref[0]
        if normalize:
            x = zscore_tile(x)

        h = x
        for i in range(n_blocks):
            h = _conv_block(_pad_t(h), w_refs[2 * i][...], w_refs[2 * i + 1][...], compute_dtype)

        ones = jnp.full((1, h.shape[0]), 1.0 / h.shape[0], dtype=jnp.float32)
        g = jax.lax.dot_general(
            ones, h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z_ecg = _dot1(g, proj_w, compute_dtype) + proj_b[None, :]

        # demographics MLP (reference: ecg_multimodal.py:51-59)
        # demo arrives in a (8, 128) tile; row 0's first demo_dim lanes are real
        demo_dim = fc1_w.shape[0]
        d = d_ref[0, 0:1, :demo_dim]  # [1, demo_dim]
        h1 = jnp.maximum(_dot1(d, fc1_w, compute_dtype) + fc1_b[None, :], 0.0)
        h2 = jnp.maximum(_dot1(h1, fc2_w, compute_dtype) + fc2_b[None, :], 0.0)

        # FiLM (reference: ecg_multimodal.py:92-96)
        film = _dot1(h2, film_w, compute_dtype) + film_b[None, :]
        feat = z_ecg.shape[1]
        gamma = 1.0 + jnp.tanh(film[:, :feat])
        beta = film[:, feat:]
        z_cond = gamma * z_ecg + beta

        logits = _dot1(z_cond, head_w, compute_dtype) + head_b[None, :]
        if logits.shape[1] > 128:
            raise ValueError("fused kernels support num_labels <= 128")
        o_ref[0] = jnp.pad(logits, ((0, 7), (0, 128 - logits.shape[1])))

    return kernel


def fused_multimodal_logits(
    x: jnp.ndarray,
    demo: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    compute_dtype=jnp.float32,
    normalize: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, 12] raw; demo: [B, 5] -> logits [B, num_labels]."""
    n_blocks = int(folded["n_blocks"])
    weights = {k: v for k, v in folded.items() if k != "n_blocks"}
    return _fused_mm_jit(x, demo, weights, n_blocks, compute_dtype, normalize, interpret)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "normalize", "interpret")
)
def _fused_mm_jit(x, demo, folded, n_blocks, compute_dtype, normalize, interpret):
    b, t, c_in = x.shape
    num_labels = folded["head_b"].shape[0]

    # pad the [B, 5] demo vectors into TPU-tileable (B, 8, 128) blocks
    demo_tiled = jnp.zeros((b, 8, 128), dtype=jnp.float32)
    demo_tiled = demo_tiled.at[:, 0, : demo.shape[1]].set(demo)

    weight_args = []
    in_specs = [
        pl.BlockSpec((1, t, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]

    def const_spec(arr):
        zeros = (0,) * arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    for i in range(n_blocks):
        for key in (f"w{i}", f"b{i}"):
            weight_args.append(folded[key])
            in_specs.append(const_spec(folded[key]))
    for key in _MM_DENSE_KEYS:
        weight_args.append(folded[key])
        in_specs.append(const_spec(folded[key]))

    out = pl.pallas_call(
        _make_mm_kernel(n_blocks, compute_dtype, normalize),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, demo_tiled, *weight_args)
    return out[:, 0, :num_labels]


def fused_multimodal_probs(x, demo, folded, compute_dtype=jnp.float32, normalize=True, interpret=False):
    return jax.nn.sigmoid(
        fused_multimodal_logits(x, demo, folded, compute_dtype, normalize, interpret)
    )
