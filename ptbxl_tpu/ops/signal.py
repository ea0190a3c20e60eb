"""Optional ECG signal-conditioning ops (device-side, jit-friendly).

The reference performs no filtering or resampling (its only preprocessing is
the per-lead z-score), but a production ECG pipeline commonly needs these, so
the framework provides them as composable ops, OFF by default to preserve
reference parity:

* ``fir_bandpass``            — windowed-sinc FIR bandpass as a depthwise conv
* ``remove_baseline_wander``  — moving-average high-pass
* ``resample_linear``         — fixed-ratio linear resampling

All are static-shape, channels-last [B, T, C], and fuse under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sinc_kernel(lo_hz: float, hi_hz: float, fs: float, num_taps: int) -> np.ndarray:
    """Hamming-windowed sinc bandpass kernel (host-side, static)."""
    if num_taps % 2 == 0:
        num_taps += 1
    t = np.arange(num_taps) - (num_taps - 1) / 2
    nyq = fs / 2.0
    if not 0 <= lo_hz < hi_hz <= nyq:
        raise ValueError(
            f"band edges must satisfy 0 <= lo ({lo_hz}) < hi ({hi_hz}) <= "
            f"Nyquist ({nyq})"
        )

    def lowpass(cut):
        h = np.sinc(2 * cut / fs * t) * (2 * cut / fs)
        return h

    h = lowpass(hi_hz) - (lowpass(lo_hz) if lo_hz > 0 else 0.0)
    h *= np.hamming(num_taps)
    if lo_hz <= 0:  # pure lowpass: normalize DC gain
        h /= h.sum()
    return h.astype(np.float32)


def fir_bandpass(
    x: jnp.ndarray, lo_hz: float = 0.5, hi_hz: float = 40.0, fs: float = 500.0, num_taps: int = 101
) -> jnp.ndarray:
    """Zero-phase-ish FIR bandpass applied per lead. x: [B, T, C]."""
    h = jnp.asarray(_sinc_kernel(lo_hz, hi_hz, fs, num_taps), dtype=x.dtype)
    k = h.shape[0]
    c = x.shape[-1]
    # depthwise conv: feature_group_count = C, kernel [k, 1, C]
    kernel = jnp.tile(h[:, None, None], (1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
        precision="highest",
    )


def remove_baseline_wander(x: jnp.ndarray, fs: float = 500.0, window_s: float = 0.6) -> jnp.ndarray:
    """Subtract a moving-average trend (classic baseline-wander removal)."""
    w = int(round(window_s * fs))
    if w % 2 == 0:
        w += 1
    kernel = jnp.full((w, 1, 1), 1.0 / w, dtype=x.dtype)
    c = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, c))
    trend = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(w // 2, w // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
        precision="highest",
    )
    return x - trend


def resample_linear(x: jnp.ndarray, fs_in: float, fs_out: float) -> jnp.ndarray:
    """Linear resampling along the time axis. x: [B, T, C] -> [B, T', C]."""
    t_in = x.shape[1]
    t_out = int(round(t_in * fs_out / fs_in))
    pos = jnp.linspace(0.0, t_in - 1.0, t_out)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t_in - 1)
    w = (pos - i0).astype(x.dtype)[None, :, None]
    return x[:, i0, :] * (1 - w) + x[:, i1, :] * w
