"""Phase-domain Conv1d: stride-2 conv emitting both pool phases as channels.

The training backward's dominant waste is MaxPool's gradient: XLA lowers it
to SelectAndScatter, measured (tools/probe_bwd_breakdown.py, bs 4096 bf16,
v5e) at ~17-27 ms per block per step — ~60 ms of a 137 ms backward.  Every
attempt to re-implement that VJP loses elsewhere (sublane reshapes break
forward fusion; a Pallas VJP drowns in padded->compact relayouts —
ops/relu_pool.py).  The winning move is to REMOVE the pool op: re-express

    conv(k, SAME, stride 1) -> BN -> relu -> maxpool(2)

as the mathematically identical

    phase_conv: conv(k+1, stride 2, Cout doubled) -> [B, U, 2, C]
    BN over [B, U, 2, C]   (feature axis last: stats reduce over B, U and
                            the phase axis — exactly the stats of [B,T,C])
    relu -> max over the phase axis (elementwise VJP, no SelectAndScatter)

where phase_conv's kernel is the original w with a zero tap appended for
phase 0 and prepended for phase 1:

    out[u, 0, c] = h[2u, c],   out[u, 1, c] = h[2u+1, c]   (exact: the
    extra tap multiplies by zero, contributing nothing to the f32/bf16 sum)

Wins (measured at bs 4096, bf16): the pool VJP becomes an elementwise
equality mask; the [B, 5000, C] activations disappear entirely (largest
tensors halve); Cout doubles so C=32/64 layers waste less of the 128-lane
tile; and everything is plain XLA — fully GSPMD-partitionable, unlike a
Pallas kernel.  Requires even T (ECGCNN blocks 1-3: 5000/2500/1250; block 4
keeps the standard path, its T=625 puts the 625th row into BN statistics
which the phase form cannot see).

Tie semantics at the phase max: jnp.max splits the cotangent evenly where
torch routes it to the first element; post-ReLU the only realizable ties
are exact zeros whose cotangents die in the ReLU mask, so trajectories
match torch (same argument as ops/relu_pool.py, pinned by
tests/test_phase_conv.py).

Reference ops being trained: nn.Conv1d + nn.MaxPool1d in
src/models/ecg_cnn.py:5-20 (torch autograd differentiates them op-by-op;
this module is the TPU-shaped equivalent of that training graph).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


def build_phase_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k, Cin, Cout] -> [k+1, Cin, 2*Cout]: zero tap appended (phase 0) /
    prepended (phase 1)."""
    z = jnp.zeros_like(w[:1])
    w0 = jnp.concatenate([w, z], axis=0)
    w1 = jnp.concatenate([z, w], axis=0)
    return jnp.concatenate([w0, w1], axis=2)


def phase_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    precision=None,
) -> jnp.ndarray:
    """SAME stride-1 conv1d, both pool phases as channels.

    x [B, T, Cin] (T even), w [k, Cin, Cout] (k odd) -> [B, T//2, 2, Cout]
    with out[:, u, j] == conv_same(x, w)[:, 2u+j] exactly.
    """
    B, T, Ci = x.shape
    k, _, Co = w.shape
    if T % 2:
        raise ValueError(f"phase_conv needs even T, got {T}")
    if k % 2 == 0:
        raise ValueError(f"phase_conv needs odd k (SAME padding), got {k}")
    U = T // 2
    pl = k // 2
    # largest read: position 2(U-1) + k into x padded (pl, pr)
    pr = 2 * (U - 1) + k - (T - 1) - pl  # == k - 1 - pl for even T
    wp = build_phase_kernel(w)
    out = lax.conv_general_dilated(
        x, wp, window_strides=(2,), padding=[(pl, pr)],
        dimension_numbers=_DIMNUMS, precision=precision)
    if b is not None:
        out = out + jnp.concatenate([b, b]).reshape(1, 1, -1)
    return out.reshape(B, U, 2, Co)
