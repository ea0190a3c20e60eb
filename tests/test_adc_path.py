"""int16 device-conversion transfer path equals the float32 path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch  # noqa: E402
from ptbxl_tpu.ops.adc_convert import adc_to_physical_batch  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def test_adc_convert_matches_host(rng):
    adc = rng.integers(-3000, 3000, size=(2, 64, 12)).astype(np.int16)
    adc[0, 5, 3] = -32768  # sentinel
    gain = rng.uniform(500, 1500, size=(2, 12)).astype(np.float32)
    baseline = rng.integers(-5, 5, size=(2, 12)).astype(np.float32)
    got = np.asarray(adc_to_physical_batch(jnp.asarray(adc), jnp.asarray(gain), jnp.asarray(baseline)))
    want = (adc.astype(np.float32) - baseline[:, None, :]) / gain[:, None, :]
    want[0, 5, 3] = np.nan
    np.testing.assert_allclose(got, want, atol=1e-6, equal_nan=True)


def test_emit_adc_pipeline_equals_f32_pipeline(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "val", CLASSES)
    f32_batches = list(device_prefetch(BatchSource(ds, 4, False).epoch(0)))
    adc_batches = list(
        device_prefetch(BatchSource(ds, 4, False, emit_adc=True).epoch(0))
    )
    assert len(f32_batches) == len(adc_batches)
    for a, b in zip(f32_batches, adc_batches):
        assert "ecg" in b and "adc_lt" not in b
        np.testing.assert_allclose(np.asarray(a["ecg"]), np.asarray(b["ecg"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["y"]), np.asarray(b["y"]))


def test_emit_adc_halves_host_bytes(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "val", CLASSES)
    src = BatchSource(ds, 4, False, emit_adc=True)
    batch = next(iter(src.epoch(0)))
    assert batch["adc_lt"].dtype == np.int16
    assert batch["adc_lt"].nbytes * 2 == batch["adc_lt"].size * 4  # vs f32
    # shipped in the memmap's native [B, L, T] layout: no host transpose
    assert batch["adc_lt"].shape[1] == 12
