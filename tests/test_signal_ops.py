"""Optional signal-conditioning ops (bandpass, baseline wander, resample)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.ops.signal import (  # noqa: E402
    fir_bandpass,
    remove_baseline_wander,
    resample_linear,
)

FS = 500.0


def _tone(freq, t=6.0, fs=FS):
    ts = np.arange(int(t * fs)) / fs
    return np.sin(2 * np.pi * freq * ts).astype(np.float32)


def test_bandpass_attenuates_out_of_band():
    # 5-40 Hz band with 501 taps -> ~4 Hz transition width at fs=500
    lo_tone = _tone(0.3)  # far below the 5 Hz edge
    mid_tone = _tone(15.0)
    hi_tone = _tone(120.0)  # far above 40 Hz
    x = np.stack([lo_tone, mid_tone, hi_tone], axis=-1)[None]  # [1, T, 3]
    y = np.asarray(fir_bandpass(jnp.asarray(x), 5.0, 40.0, FS, num_taps=501))
    m = y[0, 500:-500]  # ignore edges
    rms = np.sqrt((m**2).mean(axis=0))
    assert rms[1] > 0.6  # mid passes
    assert rms[0] < 0.1 and rms[2] < 0.1  # out-of-band attenuated


def test_baseline_wander_removal():
    drift = _tone(0.2) * 2.0
    ecg = _tone(8.0) * 0.5
    x = (drift + ecg)[None, :, None]
    y = np.asarray(remove_baseline_wander(jnp.asarray(x), FS, window_s=0.8))
    m = y[0, 400:-400, 0]
    # drift mostly removed: residual power far below input drift power
    assert np.sqrt((m**2).mean()) < 0.8
    assert abs(m.mean()) < 0.05


def test_resample_shapes_and_values():
    x = np.linspace(0, 1, 500, dtype=np.float32)[None, :, None]
    y = np.asarray(resample_linear(jnp.asarray(x), 500.0, 100.0))
    assert y.shape == (1, 100, 1)
    np.testing.assert_allclose(y[0, :, 0], np.linspace(0, 1, 100), atol=1e-2)
