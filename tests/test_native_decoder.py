"""C++ batch WFDB decoder vs the pure-Python reader."""

import os

import numpy as np
import pytest

from ptbxl_tpu.io import native
from ptbxl_tpu.io.wfdb_io import read_adc, rdsamp, write_record_fmt16

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native lib"
)


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(3)
    paths = []
    for i in range(5):
        sig = rng.standard_normal((300, 12)) * 2
        rec = str(d / f"rec{i:02d}")
        write_record_fmt16(rec, sig, gain=1000.0)
        paths.append(rec)
    return paths


def test_batch_decode_matches_python(records):
    dat_paths = [p + ".dat" for p in records]
    adc, ok = native.decode_batch_fmt16(dat_paths, 300, 12)
    assert ok.all()
    for i, rec in enumerate(records):
        py_adc, _ = read_adc(rec)
        np.testing.assert_array_equal(adc[i], py_adc.T)


def test_decode_missing_file_flags_failure(records, tmp_path):
    dat_paths = [records[0] + ".dat", str(tmp_path / "nope.dat")]
    adc, ok = native.decode_batch_fmt16(dat_paths, 300, 12)
    assert ok[0] and not ok[1]
    assert np.all(adc[1] == 0)


def test_adc_to_physical_matches_python(records):
    rec = records[0]
    py_phys, header = rdsamp(rec)
    adc, _ = read_adc(rec)
    gains = np.array([s.gain for s in header.signals], np.float32)
    baselines = np.array([s.effective_baseline for s in header.signals], np.float32)
    phys = native.adc_to_physical(adc.T, gains, baselines)
    np.testing.assert_allclose(phys, py_phys.astype(np.float32).T, atol=1e-6)


def test_adc_to_physical_nan_sentinel(tmp_path):
    rec = str(tmp_path / "nanrec")
    write_record_fmt16(rec, np.zeros((8, 2)), gain=1000.0)
    raw = np.fromfile(rec + ".dat", dtype="<i2")
    raw[3] = -32768
    raw.tofile(rec + ".dat")
    adc, ok = native.decode_batch_fmt16([rec + ".dat"], 8, 2)
    assert ok.all()
    phys = native.adc_to_physical(adc[0], np.full(2, 1000.0, np.float32), np.zeros(2, np.float32))
    # raw index 3 -> frame 1, signal 1 -> transposed [1, 1]
    assert np.isnan(phys[1, 1])
    assert np.isfinite(phys).sum() == 15


def test_cache_uses_native_and_matches(ptbxl_dir):
    """ADCCache built via the native fast path equals per-record reads."""
    from ptbxl_tpu.data import PTBXLDataset
    from ptbxl_tpu.data.cache import ADCCache

    ds = PTBXLDataset(ptbxl_dir, "val", ["MI", "STTC", "HYP", "CD", "NORM"])
    cache = ADCCache(ptbxl_dir, ds.df["filename_hr"].tolist(),
                     cache_dir=os.path.join(ptbxl_dir, ".native_cache_test"))
    cache.ensure_built()
    for i in range(len(ds)):
        np.testing.assert_allclose(cache.get_physical([i])[0], ds.get_raw(i), atol=1e-6)


def test_gather_rows_matches_fancy_index(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    src = rng.integers(-32768, 32767, size=(64, 12, 100), dtype=np.int16)
    idx = rng.permutation(64)[:17]
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    # memmap source (the real use), repeated indices (padded final batch)
    path = str(tmp_path / "mm.npy")
    mm = np.lib.format.open_memmap(path, mode="w+", dtype=np.int16, shape=src.shape)
    mm[:] = src
    mm.flush()
    ro = np.load(path, mmap_mode="r")
    idx2 = np.array([3, 3, 0, 63, 3])
    np.testing.assert_array_equal(native.gather_rows(ro, idx2), src[idx2])


def test_gather_rows_rejects_bad_indices():
    if not native.available():
        pytest.skip("no native toolchain")
    src = np.zeros((4, 3), dtype=np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([0, 4]))
    with pytest.raises(ValueError):
        native.gather_rows(np.asfortranarray(np.zeros((4, 3, 2), np.int16)), np.array([0]))


def test_gather_records_fallback_equivalence():
    from ptbxl_tpu.data.cache import gather_records

    src = np.arange(120, dtype=np.int16).reshape(10, 4, 3)
    idx = np.array([9, 0, 5, 5])
    np.testing.assert_array_equal(gather_records(src, idx), src[idx])
