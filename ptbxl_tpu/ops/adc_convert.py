"""Device-side ADC -> physical conversion (int16 transfer path).

The cache stores lossless int16 ADC samples (data/cache.py).  Transferring
those to the device and converting there HALVES host->device bandwidth versus
float32 physical signals — the dominant cost of an input-bound serving
pipeline — and the affine conversion + z-score fuse into the forward pass.

phys = (adc - baseline) / gain, with the WFDB missing sentinel (-32768)
mapped to NaN (matching wfdb and io/wfdb_io.py semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

_SENTINEL = -32768


def adc_to_physical_batch(
    adc: jnp.ndarray, gain: jnp.ndarray, baseline: jnp.ndarray
) -> jnp.ndarray:
    """adc [B, T, C] int16; gain/baseline [B, C] -> physical float32 [B, T, C]."""
    a = adc.astype(jnp.float32)
    phys = (a - baseline[:, None, :]) / gain[:, None, :]
    return jnp.where(adc == _SENTINEL, jnp.nan, phys)


def adc_lt_to_physical_batch(
    adc_lt: jnp.ndarray, gain: jnp.ndarray, baseline: jnp.ndarray
) -> jnp.ndarray:
    """adc [B, C, T] int16 (the memmap cache's native layout, shipped without
    any host-side transpose) -> physical float32 [B, T, C].  The transpose
    rides the device where it is a cheap relayout fused with the conversion."""
    adc = jnp.transpose(adc_lt, (0, 2, 1))
    return adc_to_physical_batch(adc, gain, baseline)
