"""ReLU -> MaxPool1d(2) with a Pallas backward (TPU training path).

Why: XLA differentiates ``max_pool`` into a SelectAndScatter HLO, measured
(tools/probe_bwd_breakdown.py, bs 4096 bf16, v5e) at ~17-27 ms per block
per training step — ~60 ms of the 136 ms backward, an order of magnitude
over the memory bound.  Every XLA-level reformulation loses MORE elsewhere
(tools/probe_pool.py: reshape+axis-max and strided-maximum slow the
*forward* 3-5x — sublane-splitting reshapes break the BN/ReLU/pool fusion;
``.at[].set`` strided scatters are worse still).  The only formulation that
keeps the fast fused forward AND a memory-bound backward is a custom VJP:

  forward   unchanged ``reduce_window(relu(h))`` — bit-identical to
            ``nn.max_pool(nn.relu(h))`` (goldens pin this)
  backward  one Pallas kernel: dh = (relu(h)==y_up) & (h>0) ? g_up/cnt : 0
            — pure elementwise work + the same sublane-side [U,2,C]
            reshape the fused forward kernel (ops/pallas/fused_ecgcnn.py)
            already uses in VMEM, reading h/y/g once and writing dh once.

Tie semantics: a window whose two ReLU outputs BOTH equal the max splits
the cotangent evenly (cnt=2) where torch's maxpool routes it to the first
element.  Ties at exactly zero die one op downstream in the ReLU mask
(h<=0); ties at equal POSITIVE values (realizable with clipped/saturated
or duplicated samples) do diverge from torch, but are measure-zero for
continuous inputs — training trajectories match torch in practice (pinned
by tests/test_train_parity_torch.py).  This path is opt-in
(PTBXL_TPU_POOL_BWD=pallas); the default XLA backward matches torch
exactly.

OUTCOME (measured, full model, bs 2048/4096 bf16 on v5e): NEGATIVE — the
kernel is correct and in isolation the backward math is memory-bound, but
XLA stores the conv activations in 4x-lane-padded layouts (C=32 pads to
128) while pallas_call requires the compact layout, so each block pays a
padded->compact relayout of the 1.2-4.9 GB activation on the way in and
out: bwd measured 195 ms vs the SelectAndScatter baseline's ~137 ms, and
bs 4096 OOMs HBM on the extra compact copies.  Default is therefore the
plain XLA composite (override with PTBXL_TPU_POOL_BWD=pallas); kept as a
tested negative result in the phase_pack/hybrid tradition.  The winning
replacement is the phase-domain training path (ops/phase_conv.py): it
removes the pool op from the graph instead of re-implementing its VJP.

Reference op being trained: nn.MaxPool1d(2) in src/models/ecg_cnn.py:8.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _xla_relu_pool(h: jnp.ndarray) -> jnp.ndarray:
    """Exactly nn.max_pool(nn.relu(h), (2,), (2,), 'VALID') — computed as
    relu(max_pool(h)), identical because relu is monotone.  Pool-first
    avoids materializing the pre-pool relu: XLA gave that [B, 5000, 32]
    temp a lane-padded layout (4x expansion -> 4.9 GB at bs 4096, the
    direct cause of an HBM OOM) when the custom-vjp boundary kept it
    alive."""
    y = lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 1), (1, 2, 1), "VALID")
    return jax.nn.relu(y)


def _bwd_kernel(h_ref, g_ref, dh_ref):
    # NOTE Mosaic shape discipline: 4-D values appear ONLY as f32
    # broadcast/reshape/reduce (the idiom the fused forward kernel uses for
    # pooling); boolean vectors stay 3-D — a 4-D i1 broadcast-compare dies
    # in relayout ("non-singleton logical dimension is replicated").  All
    # math f32: Mosaic rejects bf16 cmpf, and bf16->f32 is exact so the
    # equality test is unchanged.
    h = h_ref[...]            # [1, TB, C]; odd TB only in the full-T case
    g = g_ref[...]            # [1, TB//2, C]
    _, TB, C = h.shape
    U = TB // 2
    TT = 2 * U
    u = jnp.maximum(h[:, :TT].astype(jnp.float32), 0.0)
    # recompute the pooled max in-VMEM instead of carrying y as a residual:
    # saving y would extend its lifetime across the whole backward
    # (+0.65 GB x 4 blocks at bs 4096 -> HBM OOM, measured)
    y32 = jnp.max(u.reshape(1, U, 2, C), axis=2)
    yu = jnp.broadcast_to(y32[:, :, None, :], (1, U, 2, C)).reshape(1, TT, C)
    eq = (u == yu).astype(jnp.float32)                 # exact: y is a copy of some u
    m = eq * (u > 0).astype(jnp.float32)
    cnt = jnp.sum(eq.reshape(1, U, 2, C), axis=2)      # [1, U, C], >=1 where g matters
    scale = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    su = jnp.broadcast_to(
        scale[:, :, None, :], (1, U, 2, C)).reshape(1, TT, C)
    dh_ref[:, :TT, :] = (m * su).astype(dh_ref.dtype)
    if TB > TT:  # odd tail never pools -> zero gradient
        dh_ref[:, TT:, :] = jnp.zeros((1, TB - TT, C), dh_ref.dtype)


def _pallas_bwd(h, g, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = h.shape
    U = g.shape[1]
    # Tile the time dim: ~9 live f32 [TT, C-padded-to-128] temps (measured)
    # must fit the 16 MB scoped-VMEM limit, so TT=1024 (~4.7 MB).  Mosaic
    # wants partial block dims divisible by 8 — 1024 and its half both are;
    # non-dividing grids are fine (padded reads, garbage rows never
    # written).  A full-extent block is always legal, and it is the only
    # case where T may be odd (the kernel zeroes the un-pooled tail row);
    # slicing/padding h at the XLA level instead would copy the 1.3 GB
    # activation (measured: exactly the HBM OOM margin at bs 4096).
    if T <= 1024:
        TB, n = T, 1
    else:
        assert T == 2 * U, "tiled path requires even T"
        TB, n = 1024, -(-T // 1024)
    spec = lambda t: pl.BlockSpec((1, t, C), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, n),
        in_specs=[spec(TB), spec(TB // 2)],
        out_specs=spec(TB),
        out_shape=jax.ShapeDtypeStruct((B, T, C), g.dtype),
        interpret=interpret,
    )(h, g)


def _jnp_bwd(h, g):
    """Reference backward (same tie math as the kernel); CPU/interpret path."""
    B, T, C = h.shape
    U = g.shape[1]
    u = jax.nn.relu(h)
    ur = u[:, : 2 * U].reshape(B, U, 2, C)
    y = jnp.max(ur, axis=2)
    eqr = ur == y[:, :, None, :]
    cnt = jnp.sum(eqr.astype(jnp.float32), axis=2)
    scale = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    dr = jnp.where(eqr & (ur > 0), scale[:, :, None, :], 0.0)
    dh = dr.reshape(B, 2 * U, C)
    if T > 2 * U:
        dh = jnp.concatenate(
            [dh, jnp.zeros((B, T - 2 * U, C), dh.dtype)], axis=1)
    return dh.astype(g.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _relu_pool_pallas(h, interpret=False):
    return _xla_relu_pool(h)


def _fwd(h, interpret):
    return _xla_relu_pool(h), (h,)


def _bwd(interpret, res, g):
    (h,) = res
    return (_pallas_bwd(h, g, interpret=interpret),)


_relu_pool_pallas.defvjp(_fwd, _bwd)


_FORCE_XLA_DEPTH = 0


class force_xla_pool_bwd:
    """Context manager pinning relu_max_pool2 to the plain XLA composite.

    Used by serving export (serving.py): a Pallas custom call must not leak
    into artifacts that may be lowered for non-TPU platforms or sharded
    meshes."""

    def __enter__(self):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH += 1

    def __exit__(self, *exc):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH -= 1
        return False


def _impl() -> str:
    if _FORCE_XLA_DEPTH:
        return "xla"
    forced = os.environ.get("PTBXL_TPU_POOL_BWD", "").strip().lower()
    if forced in ("pallas", "xla"):
        return forced
    # Default: xla.  The Pallas backward is a measured NEGATIVE result at
    # the full-model level: XLA keeps conv activations in 4x-lane-padded
    # layouts (C=32 -> 128) and pallas_call demands the compact layout, so
    # every block pays a padded<->compact relayout copy each way — bwd
    # 195 ms vs the SelectAndScatter baseline's ~137 ms at bs 2048 (and an
    # HBM OOM at 4096 from the extra compact copies).  The kernel itself is
    # correct (interpret-mode tests) and stays behind PTBXL_TPU_POOL_BWD=
    # pallas for future toolchains; the real fix is the phase-domain
    # training path (ops/phase_conv.py), which removes the pool op instead
    # of re-implementing its gradient.
    return "xla"


def relu_max_pool2(h: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """relu -> maxpool(2, VALID), Pallas backward on single-device TPU."""
    if _impl() == "pallas":
        return _relu_pool_pallas(h, interpret)
    return _xla_relu_pool(h)
