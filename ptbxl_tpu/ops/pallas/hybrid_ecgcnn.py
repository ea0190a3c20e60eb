"""Hybrid large-batch inference: XLA front (z-score + early convs) + ONE
Pallas kernel for the deep convs and the dense tail.

Why hybrid (measured on the real chip, tools/probe_layer_perf.py +
probe_sublane_conv.py, overhead-corrected — see docs/ARCHITECTURE.md):

* Layers 1-2 (Cin 12/32, Cout 32/64) are bound by MXU K/N-tile occupancy;
  XLA's conv emitter runs them AT that ceiling and no Mosaic-expressible
  im2col build gets close (lane-granular data placement costs a VPU pass per
  tap).  Keep them on XLA.
* Layers 3-4 (K = 15*Cin = 960/1920 after im2col, N = 128/256) fit the MXU
  perfectly; a Pallas im2col kernel (lane-concat of 15 ref slices -> one
  [M,K]x[K,N] matmul) measured ~120 TF/s on layer 4 vs ~101 for XLA's conv.
  Fusing layer 3 + layer 4 + GAP + proj + head into ONE kernel also deletes
  two activation round-trips and the tail's kernel launches.

BatchNorm is folded into conv weights (inference), exactly like the v1
single-kernel path (ops/pallas/fused_ecgcnn.py).  Reference conv stack:
/root/reference/src/models/ecg_cnn.py:35-50.

Numerics: conv/dot inputs in ``compute_dtype`` (bf16 by default), f32
accumulation everywhere — the same class as the XLA bf16 path; gated against
the f32 parity path on the demo pack in bench.py and in unit tests
(interpret mode).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_bn_into_conv  # noqa: F401
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

K = 15
PAD = K // 2


def _xla_front(x, folded, n_front: int, compute_dtype):
    """z-scored input -> first ``n_front`` conv(BN-folded)+relu+pool blocks."""
    h = x
    for i in range(n_front):
        w = folded[f"w{i}"].astype(compute_dtype)  # [15, Cin, Cout]
        b = folded[f"b{i}"]
        hp = jnp.pad(h, ((0, 0), (PAD, PAD), (0, 0))).astype(compute_dtype)
        y = jax.lax.conv_general_dilated(
            hp, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(y + b[None, None, :].astype(jnp.float32), 0.0)
        bsz, t, c = h.shape
        half = t // 2  # torch MaxPool1d(2) floors odd lengths
        h = jnp.max(h[:, : 2 * half].reshape(bsz, half, 2, c), axis=2)
    return h


def _make_tail_kernel(n_deep: int, dims, compute_dtype):
    """Pallas kernel: ``n_deep`` conv blocks + GAP + proj + head, per-sample.

    dims: list of (t_in, cin, cout) per deep block, t_in == conv length.
    """

    def kernel(*refs):
        w_refs = refs[: 2 * n_deep]
        proj_w_ref, proj_b_ref, head_w_ref, head_b_ref, x_ref, o_ref = refs[2 * n_deep : 2 * n_deep + 6]
        scratches = refs[2 * n_deep + 6 :]
        b_tile = x_ref.shape[0]

        for b in range(b_tile):
            src_ref, src_off = x_ref, b  # first deep block reads the input block
            for i, (t_in, cin, cout) in enumerate(dims):
                w = w_refs[2 * i][...].astype(compute_dtype)  # [15*Cin, Cout]
                bias = w_refs[2 * i + 1][...].astype(jnp.float32)
                if src_ref is x_ref:
                    pieces = [
                        src_ref[src_off, k : k + t_in, :].astype(compute_dtype)
                        for k in range(K)
                    ]
                else:
                    pieces = [
                        src_ref[k : k + t_in, :].astype(compute_dtype) for k in range(K)
                    ]
                y = jnp.concatenate(pieces, axis=1)  # [t_in, 15*Cin]
                acc = jax.lax.dot_general(
                    y, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(acc + bias[None, :], 0.0)
                half = t_in // 2
                h = jnp.max(h[: 2 * half].reshape(half, 2, cout), axis=1)
                if i + 1 < n_deep:
                    # stage through a zero-bordered VMEM scratch so the next
                    # block can REF-slice its im2col pieces (value-level
                    # slice+concat crashes Mosaic — docs/ARCHITECTURE.md)
                    s = scratches[i]
                    s[:PAD, :] = jnp.zeros((PAD, cout), s.dtype)
                    s[PAD : PAD + half, :] = h.astype(s.dtype)
                    s[PAD + half :, :] = jnp.zeros((s.shape[0] - PAD - half, cout), s.dtype)
                    src_ref, src_off = s, None

            # GAP as a ones-matmul (cross-sublane reduce relayout workaround)
            t_f = h.shape[0]
            ones = jnp.full((1, t_f), 1.0 / t_f, dtype=jnp.float32)
            g = jax.lax.dot_general(
                ones, h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, C]
            z = (
                jax.lax.dot_general(
                    g.astype(compute_dtype), proj_w_ref[...].astype(compute_dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + proj_b_ref[...][None, :]
            )
            logits = (
                jax.lax.dot_general(
                    z.astype(compute_dtype), head_w_ref[...].astype(compute_dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + head_b_ref[...][None, :]
            )
            if logits.shape[1] > 128:
                raise ValueError("fused kernels support num_labels <= 128")
            o_ref[b, :] = jnp.pad(logits, ((0, 0), (0, 128 - logits.shape[1])))[0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_blocks", "split", "compute_dtype", "normalize", "interpret", "block_b",
    ),
)
def hybrid_ecgcnn_logits(
    x: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    n_blocks: int,
    split: int = 2,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
    interpret: bool = False,
    block_b: int = 8,
) -> jnp.ndarray:
    """x [B, T, 12] raw -> logits [B, num_labels] (B padded internally)."""
    if not 0 < split < n_blocks:
        raise ValueError(
            f"split must leave at least one XLA front block and one Pallas "
            f"deep block: 0 < split ({split}) < n_blocks ({n_blocks})"
        )
    if normalize:
        x = zscore_per_lead_batch(x)
    h = _xla_front(x, folded, split, compute_dtype)  # [B, t3, C]

    bsz = h.shape[0]
    b_tile = min(block_b, bsz)
    pad_b = (-bsz) % b_tile
    if pad_b:
        h = jnp.concatenate([h, jnp.zeros((pad_b,) + h.shape[1:], h.dtype)], axis=0)
    b_total = bsz + pad_b

    # geometry of the deep blocks
    dims = []
    t = h.shape[1]
    for i in range(split, n_blocks):
        cin = folded[f"w{i}"].shape[1]
        cout = folded[f"w{i}"].shape[2]
        dims.append((t, cin, cout))
        t = t // 2
    n_deep = len(dims)

    hp = jnp.pad(h, ((0, 0), (PAD, PAD), (0, 0)))  # time borders for block 1

    weight_args = []
    in_specs = []

    def const_spec(arr):
        zeros = (0,) * arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    for i in range(split, n_blocks):
        w2d = folded[f"w{i}"].reshape(-1, folded[f"w{i}"].shape[2])  # [15*Cin, Cout]
        weight_args.append(w2d)
        in_specs.append(const_spec(w2d))
        weight_args.append(folded[f"b{i}"])
        in_specs.append(const_spec(folded[f"b{i}"]))
    for key in ("proj_w", "proj_b", "head_w", "head_b"):
        weight_args.append(folded[key])
        in_specs.append(const_spec(folded[key]))

    t3, c3 = hp.shape[1], hp.shape[2]
    in_specs.append(
        pl.BlockSpec((b_tile, t3, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )

    scratch_shapes = [
        pltpu.VMEM((dims[i][0] // 2 + 2 * PAD, dims[i][2]), jnp.float32)
        for i in range(n_deep - 1)
    ]

    num_labels = folded["head_b"].shape[0]
    flops = 0
    for (t_in, cin, cout) in dims:
        flops += 2 * K * cin * cout * t_in * b_total

    out = pl.pallas_call(
        _make_tail_kernel(n_deep, dims, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((b_total, 128), jnp.float32),
        grid=(b_total // b_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=b_total * t3 * c3 * 4, transcendentals=0
        ),
        interpret=interpret,
    )(*weight_args, hp)
    return out[:bsz, :num_labels]


def hybrid_ecgcnn_probs(
    x, folded, compute_dtype=jnp.bfloat16, normalize=True, interpret=False,
    split: int = 2, block_b: int = 8,
):
    """x [B, T, 12] raw -> probs.  ``folded`` from fold_bn_into_conv."""
    n_blocks = int(folded["n_blocks"])
    weights = {k: v for k, v in folded.items() if k != "n_blocks"}
    return jax.nn.sigmoid(
        hybrid_ecgcnn_logits(
            x, weights, n_blocks, split=split, compute_dtype=compute_dtype,
            normalize=normalize, interpret=interpret, block_b=block_b,
        )
    )
