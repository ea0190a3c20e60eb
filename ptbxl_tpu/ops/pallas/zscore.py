"""Pallas fused per-lead z-score kernel.

Equivalent to ops/preprocess.zscore_per_lead_batch (the XLA reference path):
per-(sample, lead) mean/std over time, ``(x - mean) / (std + 1e-6)``.  One
grid step per batch row; the [T, C] tile lives in VMEM and is normalized with
two VPU reduction passes (mean, then centered variance) — a single HBM
read/write of the signal.
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
    o_ref[0] = zscore_tile(x_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def zscore_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: [B, T, C] -> per-lead z-scored, same shape/dtype."""
    b, t, c = x.shape
    return pl.pallas_call(
        _zscore_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
