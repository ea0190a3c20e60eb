"""Phase-packed conv lowering: lift early-layer MXU occupancy past the
Cout<128 ceiling (pure XLA; mathematically exact).

The ECGCNN's first two convs (Cout 32/64 — reference:
src/models/ecg_cnn.py:35-43) waste 3/4 and 1/2 of the MXU's 128-wide output
tiles: measured in-model they run at the K/N-tile occupancy ceiling
(~36 TF/s combined) while the deep layers run near peak (~174 TF/s).

The fix re-expresses conv1 as a STRIDE-4 conv producing 4 consecutive output
positions ("phases") stacked into the channel dim:

    out[4*t2 + q, co] = sum_k x[4*t2 + q + k - 7, c] * W[k, c, co]
                      = (conv_{stride=4, k=18}(x_pad, W4))[t2, q*32 + co]
    W4[u, c, q*32+co] = W[u-q, c, co]  (0 <= u-q < 15, else 0)

-> N = 4*32 = 128 (full lanes), K = 18*12; ~4x the occupancy at the price of
18/15 tap padding.  MaxPool(2) pairs phases (2q', 2q'+1) of the SAME t2, so
pooling is a channel-block max and the result is exactly the 2-phase packing
conv2 wants; conv2 becomes a stride-1, k=9, 64->128 conv over t2 (phases in
channels), and ITS pool unpacks back to plain [B, 1250, 64] — bit-for-bit
the tensor layer 3 expects.  No scatter/interleave ever materializes.

Weights are rearranged from the BN-folded originals at trace time; with f32
precision the outputs match the plain lowering to float-reassociation noise
(tested at 2e-5), and the bf16 path stays inside the 5e-3 demo-pack gate.

MEASURED OUTCOME (v5e, bs 8192, bench harness): neutral — 5.26 us/sample for
the packed front vs 5.24 plain.  XLA's conv emitter evidently performs the
equivalent output-position packing internally (which also explains its L1
rate sitting ABOVE the naive N=32 occupancy ceiling).  Kept as a tested,
exact transformation and a documented negative result; it is NOT wired into
the serving paths.  See docs/ARCHITECTURE.md "Kernel performance analysis".
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

K = 15
PAD = K // 2


def pack_conv1_weights(w: jnp.ndarray, b: jnp.ndarray, phases: int = 4):
    """w [15, Cin, Cout], b [Cout] -> stride-``phases`` packed (w4, b4).

    w4: [15 + phases - 1, Cin, phases*Cout] with w4[u, c, q*Cout+co] =
    w[u-q, c, co] where valid, zero elsewhere.
    """
    k, cin, cout = w.shape
    taps = k + phases - 1
    w4 = np.zeros((taps, cin, phases * cout), dtype=np.float32)
    wn = np.asarray(w, dtype=np.float32)
    for q in range(phases):
        w4[q : q + k, :, q * cout : (q + 1) * cout] = wn
    b4 = jnp.tile(jnp.asarray(b), phases)
    return jnp.asarray(w4), b4


def pack_conv2_weights(w: jnp.ndarray, b: jnp.ndarray, phases_in: int = 2,
                       phases_out: int = 2):
    """w [15, Cin, Cout] -> conv over packed-t2 (w9, b9).

    Input channels are phase-packed p*Cin+c (p < phases_in); output channels
    q*Cout+co (q < phases_out).  Tap d covers input position
    phases_in*(t2+d) + p; output position phases_out*t2 + q.
    """
    k, cin, cout = w.shape
    wn = np.asarray(w, dtype=np.float32)
    # output time offset v = phases_in*d + p - (q) must satisfy the original
    # kernel relation: k_orig = v + PAD where v = (input pos) - (output pos)
    # input pos = phases_in*(t2+d) + p ; output pos = phases_out*t2 + q
    # (phases_in == phases_out == P below; general forms left explicit)
    assert phases_in == phases_out, "mixed phase factors not needed here"
    P = phases_in
    # v ranges over [-PAD, k - PAD): d = floor((v + q) / P) covers
    d_lo = -((PAD + P - 1) // P)
    d_hi = (k - PAD - 1 + (P - 1)) // P
    taps = d_hi - d_lo + 1
    w9 = np.zeros((taps, P * cin, P * cout), dtype=np.float32)
    for q in range(P):
        for d in range(d_lo, d_hi + 1):
            for p in range(P):
                k_orig = P * d + p - q + PAD
                if 0 <= k_orig < k:
                    w9[d - d_lo, p * cin : (p + 1) * cin, q * cout : (q + 1) * cout] = \
                        wn[k_orig]
    b9 = jnp.tile(jnp.asarray(b), P)
    return jnp.asarray(w9), b9, -d_lo, taps


def _pool_packed_channels(h: jnp.ndarray, phases: int, cout: int) -> jnp.ndarray:
    """MaxPool(2) on a phase-packed tensor = max over phase pairs."""
    bsz, t2, _ = h.shape
    h = h.reshape(bsz, t2, phases // 2, 2, cout)
    return jnp.max(h, axis=3).reshape(bsz, t2, (phases // 2) * cout)


def prepack_front(folded: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Pack the BN-folded conv1/conv2 weights ONCE (concrete arrays only —
    the packing scatters with numpy and cannot run under tracing).  The
    returned dict is a plain array pytree, safe to pass through jit."""
    w4, b4 = pack_conv1_weights(folded["w0"], folded["b0"], phases=4)
    w9, b9, _, _ = pack_conv2_weights(folded["w1"], folded["b1"], 2, 2)
    return {"pp_w4": w4, "pp_b4": b4, "pp_w9": w9, "pp_b9": b9}


def phase_packed_front(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                       compute_dtype=jnp.bfloat16,
                       packed: Dict[str, jnp.ndarray] = None) -> jnp.ndarray:
    """z-scored x [B, T, 12] -> layer-2 pooled output [B, T/4, C2out].

    Exactly equivalent to conv1+relu+pool followed by conv2+relu+pool with
    the BN-folded weights in ``folded`` (w0/b0, w1/b1).  Under jit, pass a
    ``packed`` dict from :func:`prepack_front` (weights as leaves, the static
    ints closed over).
    """
    if packed is None:
        packed = prepack_front(folded)

    # ---- conv1: stride-4, 4 phases into channels ----
    w4, b4 = packed["pp_w4"], packed["pp_b4"]
    taps1 = w4.shape[0]
    cout1 = w4.shape[2] // 4
    cout2 = packed["pp_w9"].shape[2] // 2
    # output positions 4*t2+q for q<4 need input rows 4*t2 + u - PAD
    xp = jnp.pad(x, ((0, 0), (PAD, taps1 - 1 - PAD), (0, 0)))
    h = jax.lax.conv_general_dilated(
        xp.astype(compute_dtype), w4.astype(compute_dtype),
        window_strides=(4,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    h = jnp.maximum(h + b4[None, None, :].astype(jnp.float32), 0.0)
    h = _pool_packed_channels(h, 4, cout1)  # -> [B, T/4, 2*cout1], 2-phase

    # ---- conv2: stride-1 over t2, 2 phases in and out ----
    w9, b9 = packed["pp_w9"], packed["pp_b9"]
    taps2 = w9.shape[0]
    # conv2's pad offset must mirror the packer's -d_lo = ceil(PAD/P) with
    # P=2 phases (NOT taps2 // 2, which only coincides for the symmetric
    # K=15/PAD=7 window); static so it stays a concrete pad width under jit
    pad_left = (PAD + 2 - 1) // 2
    hp = jnp.pad(h, ((0, 0), (pad_left, taps2 - 1 - pad_left), (0, 0)))
    h = jax.lax.conv_general_dilated(
        hp.astype(compute_dtype), w9.astype(compute_dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    h = jnp.maximum(h + b9[None, None, :].astype(jnp.float32), 0.0)
    return _pool_packed_channels(h, 2, cout2)  # -> [B, T/4, cout2], unpacked
