"""Pallas fused per-lead z-score kernels.

Equivalent to ops/preprocess.zscore_per_lead_batch (the XLA reference path):
per-(sample, lead) mean/std over time, ``(x - mean) / (std + 1e-6)``, with
f32 accumulation regardless of the wire dtype.

Two layouts:

* :func:`zscore_pallas` — one grid step per record, the natural
  ``[1, T, C]`` block.  C=12 leaves 12/128 lanes occupied; the HBM side of
  the DMA is contiguous but the VMEM side moves 24-byte rows, so its
  efficiency is a DMA-engine question, settled empirically (bench ceiling
  block `zscore`, tools/probe_zscore.py).
* :func:`zscore_pallas_wide` — the lane-remap kernel.  ``[T, 12]`` is viewed
  as ``[T*12/W, W]`` with W a multiple of 12 (default 480): the flat index
  ``t*12 + c`` lands on lane ``l = (t*12+c) % W``, so lane ``l`` always
  holds lead ``l % 12`` and a sublane reduction gives per-(lane-slot)
  partial sums.  The per-lead fold + broadcast-back is ONE tiny MXU matmul
  against the [W, W] 0/1 matrix ``G[i,j] = (i % 12 == j % 12)`` built from
  iota in-registers — no cross-lane reshapes of the big tile (Mosaic
  relayouts are the expensive thing to avoid; docs/ARCHITECTURE.md).
  This keeps VMEM rows at W lanes (480/512 = 94% occupancy vs 12/128 = 9%)
  at the cost of two XLA reshapes outside the kernel (whether those are
  free layout bitcasts or real copies is measured, not assumed).

The normalization math is the exact two-pass form (mean, then centered
variance) — the tile is VMEM-resident so the second pass costs VPU reads,
not HBM traffic — keeping numerics in lockstep with the XLA path that the
demo-pack parity gates pin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def zscore_tile(x):
    """Per-lead z-score of one [T, C] tile — the in-kernel building block.

    Single source of truth for the '(x - mean)/(std + 1e-6)' semantics that
    must stay in lockstep with ops/preprocess.zscore_per_lead_batch (the
    demo-pack parity gates pin it); used by every Pallas kernel that fuses
    normalization.
    """
    t = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / t
    centered = x - mean
    var = jnp.sum(centered * centered, axis=0, keepdims=True) / t
    return centered / (jnp.sqrt(var) + EPS)


def _zscore_kernel(x_ref, o_ref):
    o_ref[0] = zscore_tile(x_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def zscore_pallas(x: jnp.ndarray, out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x: [B, T, C] -> per-lead z-scored, f32 accumulation.

    ``out_dtype`` defaults to ``x.dtype`` (e.g. bf16 wire in -> bf16 out,
    halving the write traffic vs an f32 intermediate).
    """
    b, t, c = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    return pl.pallas_call(
        _zscore_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _zscore_wide_kernel(t, c, x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # [kb, R, W]
    w = x.shape[-1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    g = ((ii % c) == (jj % c)).astype(jnp.float32)  # lead-fold + broadcast-back
    s1 = jnp.sum(x, axis=1)  # [kb, W] per-lane-slot partial sums
    tot = jax.lax.dot_general(
        s1, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mean = (tot / t)[:, None, :]
    cen = x - mean
    s2 = jnp.sum(cen * cen, axis=1)
    var = (
        jax.lax.dot_general(
            s2, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        / t
    )[:, None, :]
    o_ref[...] = (cen / (jnp.sqrt(var) + EPS)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "width", "block_b", "interpret")
)
def zscore_pallas_wide(
    x: jnp.ndarray,
    out_dtype=None,
    width: int = 480,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lane-remapped per-lead z-score: x [B, T, C] -> same shape.

    Views each record's [T, C] as [T*C/width, width] (width % C == 0, so
    lane l holds lead l % C in every row), normalizes in that layout, and
    reshapes back.  ``block_b`` records per grid step amortize grid/DMA
    overhead; B is padded up to a multiple internally.
    """
    b, t, c = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    if (t * c) % width or width % c:
        raise ValueError(f"width {width} must divide T*C={t * c} and be a multiple of C={c}")
    rows = (t * c) // width
    bp = -(-b // block_b) * block_b
    xw = x.reshape(b, rows, width)
    if bp != b:
        xw = jnp.concatenate([xw, jnp.zeros((bp - b, rows, width), x.dtype)], axis=0)
    ow = pl.pallas_call(
        functools.partial(_zscore_wide_kernel, t, c),
        out_shape=jax.ShapeDtypeStruct((bp, rows, width), out_dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, rows, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block_b, rows, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xw)
    return ow[:b].reshape(b, t, c)
