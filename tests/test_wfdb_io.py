"""WFDB reader/writer round-trip and format tests."""

import numpy as np
import pytest

from ptbxl_tpu.io.wfdb_io import (
    _decode_fmt212,
    read_adc,
    read_header,
    rdsamp,
    write_record_fmt16,
)


def test_fmt16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((256, 12)) * 2.0
    rec = str(tmp_path / "test01")
    write_record_fmt16(rec, sig, fs=500.0, gain=1000.0)

    phys, header = rdsamp(rec)
    assert header.n_sig == 12
    assert header.fs == 500.0
    assert header.n_samples == 256
    assert phys.shape == (256, 12)
    # quantization error bounded by 1/(2*gain)
    assert np.max(np.abs(phys - sig)) <= 0.5 / 1000.0 + 1e-9


def test_header_parsing(tmp_path):
    rec = str(tmp_path / "hdr01")
    write_record_fmt16(rec, np.zeros((10, 3)), gain=500.0, baseline=7)
    h = read_header(rec)
    assert [s.gain for s in h.signals] == [500.0, 500.0, 500.0]
    assert [s.effective_baseline for s in h.signals] == [7, 7, 7]
    adc, _ = read_adc(rec)
    assert adc.shape == (10, 3)
    assert np.all(adc == 7)  # physical 0 stored as baseline


def test_missing_sentinel_becomes_nan(tmp_path):
    rec = str(tmp_path / "nan01")
    write_record_fmt16(rec, np.zeros((4, 1)), gain=1000.0)
    # overwrite one sample with the fmt16 missing sentinel
    raw = np.fromfile(rec + ".dat", dtype="<i2")
    raw[2] = -32768
    raw.tofile(rec + ".dat")
    phys, _ = rdsamp(rec)
    assert np.isnan(phys[2, 0])
    assert np.isfinite(phys[[0, 1, 3], 0]).all()


def test_fmt212_decoding():
    # Hand-packed: samples 100, -200 -> 3 bytes
    s1, s2 = 100, -200
    u1, u2 = s1 & 0xFFF, s2 & 0xFFF
    b0 = u1 & 0xFF
    b1 = ((u1 >> 8) & 0x0F) | (((u2 >> 8) & 0x0F) << 4)
    b2 = u2 & 0xFF
    raw = bytes([b0, b1, b2])
    out = _decode_fmt212(raw, 2, 1)
    assert out[0, 0] == 100 and out[1, 0] == -200


def test_gain_zero_defaults(tmp_path):
    rec = str(tmp_path / "g0")
    write_record_fmt16(rec, np.ones((5, 1)), gain=1000.0)
    # rewrite header with gain 0 (-> default 200)
    lines = open(rec + ".hea").read().splitlines()
    parts = lines[1].split()
    parts[2] = "0/mV"
    lines[1] = " ".join(parts)
    open(rec + ".hea", "w").write("\n".join(lines) + "\n")
    h = read_header(rec)
    assert h.signals[0].gain == 200.0
