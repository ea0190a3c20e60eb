"""Malformed-input robustness for the clean-room WFDB reader.

A production ingestion layer must fail loudly (clean Python exceptions) on
corrupt records — never crash, hang, or silently fabricate data.
wfdb-python raises on truncated signal files; so do we (reference drop
semantics: _is_valid_ecg tolerates corrupt records by dropping them,
/root/reference/src/datasets/ptbxl.py:57-69).
"""

import os

import numpy as np
import pytest

from ptbxl_tpu.io import wfdb_io


def _write(tmp_path, hea, dat=None):
    base = str(tmp_path / "r")
    with open(base + ".hea", "w") as f:
        f.write(hea)
    if dat is not None:
        with open(base + ".dat", "wb") as f:
            f.write(dat)
    return base


def test_garbage_header_raises(tmp_path):
    base = _write(tmp_path, "]]]]]\x00 nonsense\n")
    with pytest.raises(ValueError):
        wfdb_io.rdsamp(base)


def test_empty_header_raises(tmp_path):
    base = _write(tmp_path, "")
    with pytest.raises(ValueError, match="Empty"):
        wfdb_io.rdsamp(base)


def test_negative_counts_raise(tmp_path):
    base = _write(tmp_path, "r -3 500 100\n")
    with pytest.raises(ValueError):
        wfdb_io.rdsamp(base)
    base = _write(
        tmp_path, "r 1 500 -100\nr.dat 16 1000/mV 16 0 0 0 0 I\n", b"\x00" * 10
    )
    with pytest.raises(ValueError):
        wfdb_io.rdsamp(base)


def test_missing_dat_raises(tmp_path):
    base = _write(tmp_path, "r 1 500 100\nr.dat 16 1000/mV 16 0 0 0 0 I\n")
    with pytest.raises(FileNotFoundError):
        wfdb_io.rdsamp(base)


@pytest.mark.parametrize(
    "fmt,sig_line_fmt",
    [(16, "16"), (212, "212"), (310, "310"), (311, "311"), (24, "24"), (8, "8")],
)
def test_truncated_dat_raises(tmp_path, fmt, sig_line_fmt):
    """Every format must reject a .dat too short for the declared samples —
    the packed decoders pad only the FINAL partial group, and must not
    silently zero-fill arbitrary truncation."""
    hea = (
        f"r 2 500 100\n"
        f"r.dat {sig_line_fmt} 1000/mV 12 0 0 0 0 I\n"
        f"r.dat {sig_line_fmt} 1000/mV 12 0 0 0 0 II\n"
    )
    base = _write(tmp_path, hea, b"\x00" * 5)
    with pytest.raises(ValueError, match="truncated"):
        wfdb_io.rdsamp(base)


def test_oversize_dat_tolerated(tmp_path):
    """Trailing bytes beyond the declared samples are legal (block padding)."""
    base = _write(
        tmp_path, "r 1 500 4\nr.dat 16 1000/mV 16 0 0 0 0 I\n", b"\x00" * 100
    )
    phys, header = wfdb_io.rdsamp(base)
    assert phys.shape == (4, 1)


def test_zero_gain_uses_spec_default(tmp_path):
    """gain 0 means 'use the default 200 adu/mV' per the WFDB spec."""
    adc = np.array([200, -200, 0, 400], "<i2")
    base = _write(
        tmp_path, "r 1 500 4\nr.dat 16 0/mV 16 0 0 0 0 I\n", adc.tobytes()
    )
    phys, header = wfdb_io.rdsamp(base)
    assert header.signals[0].gain == 200.0
    np.testing.assert_allclose(phys[:, 0], adc / 200.0)


def test_signal_count_mismatch_raises(tmp_path):
    base = _write(tmp_path, "r 3 500 4\nr.dat 16 1000/mV 16 0 0 0 0 I\n")
    with pytest.raises(ValueError, match="signal lines"):
        wfdb_io.rdsamp(base)


def test_unknown_format_raises(tmp_path):
    base = _write(
        tmp_path, "r 1 500 4\nr.dat 508 1000/mV 16 0 0 0 0 I\n", b"\x00" * 8
    )
    with pytest.raises(NotImplementedError, match="format"):
        wfdb_io.rdsamp(base)


def test_odd_count_212_still_reads(tmp_path):
    """The final-partial-group padding must survive the truncation check."""
    vals = np.array([1, -2, 3, -4, 5], np.int64)  # odd count
    base = str(tmp_path / "r")
    wfdb_io.write_record(base, vals[:, None] / 1000.0, fmt=212, gain=1000.0)
    phys, _ = wfdb_io.rdsamp(base)
    np.testing.assert_allclose(phys[:, 0] * 1000.0, vals)
