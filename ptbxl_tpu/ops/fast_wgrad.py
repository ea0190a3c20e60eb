"""1-D convolution with a phase-packed weight-gradient (TPU training path).

Motivation (measured, tools/probe_bwd_breakdown.py, bs 4096 bf16 on v5e):
the backward of the FIRST conv (12→32, k=15, T=5000) costs 34 ms/step —
all of it the weight gradient.  XLA lowers conv wgrad as a conv with the
batch and feature roles swapped; with Cin=12/Cout=32 the MXU output tile
(128×128) is ~4% utilized and the lowering re-reads the large activations
per tap.  FLOP-count says this gradient is worth ~2-3 ms.

The fix re-expresses the wgrad as ONE dot_general by folding P time-phases
into the matmul's free dimensions (the same phase-packing idea as
ops/phase_pack.py, applied to the gradient):

    t = P·u + p                       dy  -> [B·U, P·Cout]   (pure reshape)
    xpad[P·u + (p+κ)]                 x   -> [B·U, (q+1)·P·Cin]
        with p+κ = P·q + r            (q-shifted stacked views, q ≤ qmax)

    out[(q,r,ci),(p,co)] = Σ_{b,u} xph[b, u+q, r, ci] · dy[b, u, p, co]
    wgrad[κ,ci,co]       = Σ_p out[(p+κ)//P, (p+κ)%P, ci, p, co]

For the first block (P=8): M=288, N=256, K=B·625 — a tall MXU-shaped
matmul reading x and dy once.  The forward is the UNCHANGED
lax.conv_general_dilated call (bit-identical activations; golden tests
pin this), and the data gradient is the standard transposed conv, which
XLA dead-code-eliminates for the input layer.

Reference conv being trained: src/models/ecg_cnn.py:5-20 (torch autograd
handles its wgrad; this module is this framework's TPU-shaped equivalent).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


def _pick_phases(T: int, max_phases: int = 8) -> int:
    """Largest power of two ≤ max_phases dividing T (1 disables packing)."""
    p = 1
    while p * 2 <= max_phases and T % (p * 2) == 0:
        p *= 2
    return p


def _wgrad_conv_fallback(x, dy, k, padding, precision):
    """Classic wgrad-as-conv (batch as contraction feature): used when no
    phase count divides T.  Same formulation XLA's autodiff produces."""
    out = lax.conv_general_dilated(
        x, dy, window_strides=(1,), padding=[padding],
        dimension_numbers=("CWN", "IWO", "NWC"), precision=precision)
    return out.transpose(1, 0, 2)  # [Cin, k, Cout] -> [k, Cin, Cout]


def _phase_packed_wgrad(x, dy, k, padding, phases, precision):
    """wgrad[κ,ci,co] = Σ_{b,t} xpad[b,t+κ,ci]·dy[b,t,co] as one dot_general."""
    B, T, Ci = x.shape
    Co = dy.shape[-1]
    P = phases
    if P <= 1 or T % P:
        return _wgrad_conv_fallback(x, dy, k, padding, precision)
    pl, pr = padding
    U = T // P
    qmax = (P - 1 + k - 1) // P
    need = P * (U + qmax)
    extra = need - (T + pl + pr)
    xpad = jnp.pad(x, ((0, 0), (pl, pr + max(extra, 0)), (0, 0)))
    if extra < 0:  # more conv padding than the phase grid needs
        xpad = xpad[:, :need]
    xph = xpad.reshape(B, U + qmax, P, Ci)
    lhs = jnp.stack([xph[:, q:q + U] for q in range(qmax + 1)], axis=2)
    lhs = lhs.reshape(B * U, (qmax + 1) * P * Ci)
    rhs = dy.reshape(B * U, P * Co)
    out = lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    outr = out.reshape(qmax + 1, P, Ci, P, Co)
    taps = []
    for kk in range(k):
        acc = 0
        for p in range(P):
            s = p + kk
            acc = acc + outr[s // P, s % P, :, p, :]
        taps.append(acc)
    return jnp.stack(taps, axis=0)  # [k, Cin, Cout] f32


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv1d_fast_wgrad(x, kernel, padding: Tuple[int, int],
                      precision=None, phases: int = 8):
    """Stride-1 NWC conv1d; forward identical to flax/nn.Conv's lax call,
    backward wgrad phase-packed (see module docstring)."""
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[padding],
        dimension_numbers=_DIMNUMS, precision=precision)


def _fwd(x, kernel, padding, precision, phases):
    return conv1d_fast_wgrad(x, kernel, padding, precision, phases), (x, kernel)


def _bwd(padding, precision, phases, res, dy):
    x, kernel = res
    k = kernel.shape[0]
    pl, pr = padding
    dx = lax.conv_general_dilated(
        dy, jnp.flip(kernel, 0).swapaxes(1, 2), window_strides=(1,),
        padding=[(k - 1 - pl, k - 1 - pr)], dimension_numbers=_DIMNUMS,
        precision=precision)
    P = phases if x.shape[1] % max(phases, 1) == 0 else _pick_phases(x.shape[1], phases)
    dw = _phase_packed_wgrad(x, dy, k, (pl, pr), P, precision)
    return dx, dw.astype(kernel.dtype)


conv1d_fast_wgrad.defvjp(_fwd, _bwd)
