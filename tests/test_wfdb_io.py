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
    out = _decode_fmt212(raw, 2)
    assert out[0] == 100 and out[1] == -200


def _pack212(samples):
    """Pack a list of 12-bit signed samples per the WFDB 212 spec."""
    out = bytearray()
    for i in range(0, len(samples) - 1, 2):
        u1, u2 = samples[i] & 0xFFF, samples[i + 1] & 0xFFF
        out += bytes([u1 & 0xFF, ((u1 >> 8) & 0x0F) | (((u2 >> 8) & 0x0F) << 4), u2 & 0xFF])
    if len(samples) % 2:
        u1 = samples[-1] & 0xFFF
        out += bytes([u1 & 0xFF, (u1 >> 8) & 0x0F])  # truncated final triplet
    return bytes(out)


def test_fmt212_odd_sample_count(tmp_path):
    # 3 samples, 1 signal: 5 bytes on disk (ceil(1.5 * 3)), not 6
    samples = [100, -200, 1234]
    raw = _pack212(samples)
    assert len(raw) == 5
    out = _decode_fmt212(raw, 3)
    assert list(out) == samples

    rec = str(tmp_path / "odd212")
    with open(rec + ".dat", "wb") as f:
        f.write(raw)
    with open(rec + ".hea", "w") as f:
        f.write("odd212 1 360 3\nodd212.dat 212 200(0)/mV 12 0 100 0 0 sig0\n")
    phys, h = rdsamp(rec)
    np.testing.assert_allclose(phys[:, 0], np.array(samples) / 200.0)


def test_fmt24_roundtrip(tmp_path):
    from ptbxl_tpu.io.wfdb_io import _decode_fmt24

    vals = np.array([0, 1, -1, 8_000_000, -8_000_000, 2**23 - 1, -(2**23) + 1])
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    out = _decode_fmt24(raw, len(vals))
    np.testing.assert_array_equal(out, vals)

    rec = str(tmp_path / "f24")
    with open(rec + ".dat", "wb") as f:
        f.write(raw[: 6 * 3])  # 3 frames x 2 signals
    with open(rec + ".hea", "w") as f:
        f.write("f24 2 500 3\n"
                "f24.dat 24 1000(0)/mV 24 0 0 0 0 a\n"
                "f24.dat 24 1000(0)/mV 24 0 1 0 0 b\n")
    adc, h = read_adc(rec)
    assert adc.dtype == np.int32
    np.testing.assert_array_equal(adc, vals[:6].reshape(3, 2))


def test_samps_per_frame_smoothing(tmp_path):
    # signal 0 at 2 samples/frame, signal 1 at 1: frame = [a0, a1, b0]
    frames = np.array([[10, 20, 1], [30, 50, 2], [0, 0, 3]], dtype=np.int16)
    rec = str(tmp_path / "spf")
    with open(rec + ".dat", "wb") as f:
        f.write(frames.astype("<i2").tobytes())
    with open(rec + ".hea", "w") as f:
        f.write("spf 2 500 3\n"
                "spf.dat 16x2 1000(0)/mV 16 0 10 0 0 fast\n"
                "spf.dat 16 1000(0)/mV 16 0 1 0 0 slow\n")
    adc, h = read_adc(rec)
    assert adc.dtype == np.float64  # general path
    np.testing.assert_allclose(adc[:, 0], [15.0, 40.0, 0.0])  # frame means
    np.testing.assert_allclose(adc[:, 1], [1.0, 2.0, 3.0])
    phys, _ = rdsamp(rec)
    np.testing.assert_allclose(phys[:, 0], [0.015, 0.040, 0.0])


def test_samps_per_frame_missing_sentinel(tmp_path):
    frames = np.array([[10, -32768], [4, 6]], dtype=np.int16)
    rec = str(tmp_path / "spfnan")
    with open(rec + ".dat", "wb") as f:
        f.write(frames.astype("<i2").tobytes())
    with open(rec + ".hea", "w") as f:
        f.write("spfnan 1 500 2\nspfnan.dat 16x2 1000(0)/mV 16 0 10 0 0 s\n")
    adc, _ = read_adc(rec)
    assert np.isnan(adc[0, 0]) and adc[1, 0] == 5.0


def test_skew_shifts_and_pads(tmp_path):
    sig = np.arange(1, 6, dtype=np.int16)[:, None]  # [5, 1]
    rec = str(tmp_path / "skew")
    with open(rec + ".dat", "wb") as f:
        f.write(sig.astype("<i2").tobytes())
    with open(rec + ".hea", "w") as f:
        f.write("skew 1 500 5\nskew.dat 16:2 1000(0)/mV 16 0 1 0 0 s\n")
    h = read_header(rec)
    assert h.signals[0].skew == 2
    adc, _ = read_adc(rec)
    np.testing.assert_allclose(adc[:3, 0], [3.0, 4.0, 5.0])
    assert np.isnan(adc[3, 0]) and np.isnan(adc[4, 0])


def test_unsupported_format_raises(tmp_path):
    rec = str(tmp_path / "f999")
    with open(rec + ".dat", "wb") as f:
        f.write(b"\x00" * 16)
    with open(rec + ".hea", "w") as f:
        f.write("f999 1 500 4\nf999.dat 999 200(0)/mV 10 0 0 0 0 s\n")
    with pytest.raises(NotImplementedError, match="999"):
        read_adc(rec)


def test_fmt61_big_endian(tmp_path):
    vals = np.array([1, -1, 300, -32767, 12345], dtype=np.int64)
    raw = b"".join(int(v).to_bytes(2, "big", signed=True) for v in vals)
    rec = str(tmp_path / "f61")
    with open(rec + ".dat", "wb") as f:
        f.write(raw)
    with open(rec + ".hea", "w") as f:
        f.write("f61 1 500 5\nf61.dat 61 1000(0)/mV 16 0 1 0 0 s\n")
    adc, _ = read_adc(rec)
    np.testing.assert_array_equal(adc[:, 0], vals)


def test_fmt160_offset_binary_and_sentinel(tmp_path):
    vals = [0, 1, -1, 5000, -5000]
    raw = b"".join(int(v + 32768).to_bytes(2, "little") for v in vals)
    raw += (0).to_bytes(2, "little")  # stored 0 == amplitude -32768 == missing
    rec = str(tmp_path / "f160")
    with open(rec + ".dat", "wb") as f:
        f.write(raw)
    with open(rec + ".hea", "w") as f:
        f.write("f160 1 500 6\nf160.dat 160 1000(0)/mV 16 0 0 0 0 s\n")
    adc, _ = read_adc(rec)
    np.testing.assert_array_equal(adc[:5, 0], vals)
    phys, _ = rdsamp(rec)
    np.testing.assert_allclose(phys[:5, 0], np.array(vals) / 1000.0)
    assert np.isnan(phys[5, 0])


def test_fmt8_first_differences(tmp_path):
    # Two interleaved signals; amplitude = init_value + cumsum(diffs)
    a = np.array([5, 7, 4, 4, -3], dtype=np.int64)
    b = np.array([-2, -2, 0, 10, 9], dtype=np.int64)
    diffs_a = np.diff(np.concatenate([[a[0]], a]))  # first stored diff 0
    diffs_b = np.diff(np.concatenate([[b[0]], b]))
    inter = np.stack([diffs_a, diffs_b], axis=1).reshape(-1)
    rec = str(tmp_path / "f8")
    with open(rec + ".dat", "wb") as f:
        f.write(inter.astype(np.int8).tobytes())
    with open(rec + ".hea", "w") as f:
        f.write("f8 2 500 5\n"
                f"f8.dat 8 1000(0)/mV 8 0 {a[0]} 0 0 sa\n"
                f"f8.dat 8 1000(0)/mV 8 0 {b[0]} 0 0 sb\n")
    adc, _ = read_adc(rec)
    np.testing.assert_array_equal(adc[:, 0], a)
    np.testing.assert_array_equal(adc[:, 1], b)


def _pack310(samples):
    out = bytearray()
    for i in range(0, len(samples), 3):
        s = [samples[i + j] if i + j < len(samples) else 0 for j in range(3)]
        u = [v & 0x3FF for v in s]
        w1 = (u[0] << 1) | ((u[2] & 0x1F) << 11)
        w2 = (u[1] << 1) | (((u[2] >> 5) & 0x1F) << 11)
        out += w1.to_bytes(2, "little") + w2.to_bytes(2, "little")
    return bytes(out)


def _pack311(samples):
    out = bytearray()
    for i in range(0, len(samples), 3):
        s = [samples[i + j] if i + j < len(samples) else 0 for j in range(3)]
        w = (s[0] & 0x3FF) | ((s[1] & 0x3FF) << 10) | ((s[2] & 0x3FF) << 20)
        out += w.to_bytes(4, "little")
    return bytes(out)


@pytest.mark.parametrize("fmt,pack", [(310, _pack310), (311, _pack311)])
def test_fmt310_311_packed_10bit(tmp_path, fmt, pack):
    # 5 samples (non-multiple of 3 exercises the padded tail), incl. extremes
    vals = [100, -200, 511, -511, 7]
    raw = pack(vals)
    rec = str(tmp_path / f"f{fmt}")
    with open(rec + ".dat", "wb") as f:
        f.write(raw)
    with open(rec + ".hea", "w") as f:
        f.write(f"f{fmt} 1 500 5\nf{fmt}.dat {fmt} 200(0)/mV 10 0 100 0 0 s\n")
    adc, _ = read_adc(rec)
    np.testing.assert_array_equal(adc[:, 0], vals)


@pytest.mark.parametrize("fmt,pack", [(310, _pack310), (311, _pack311)])
def test_fmt310_311_sentinel(tmp_path, fmt, pack):
    raw = pack([-512, 3, 4])
    rec = str(tmp_path / f"nan{fmt}")
    with open(rec + ".dat", "wb") as f:
        f.write(raw)
    with open(rec + ".hea", "w") as f:
        f.write(f"nan{fmt} 1 500 3\nnan{fmt}.dat {fmt} 200(0)/mV 10 0 -512 0 0 s\n")
    phys, _ = rdsamp(rec)
    assert np.isnan(phys[0, 0])
    np.testing.assert_allclose(phys[1:, 0], [3 / 200.0, 4 / 200.0])


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


@pytest.mark.parametrize("fmt", [8, 16, 24, 32, 61, 80, 160, 212, 310, 311])
def test_write_read_roundtrip_all_formats(tmp_path, fmt):
    """Encoder/decoder round-trip for every standard format, odd T included."""
    from ptbxl_tpu.io.wfdb_io import write_record

    rng = np.random.default_rng(fmt)
    T, n_sig = 257, 3  # odd sample count exercises packed-format tails
    # smooth signals normalized to |x| <= 1 so a per-format gain keeps the
    # ADC inside the narrow ranges (80: +-127, 310/311: +-511) AND keeps
    # fmt 8's successive differences inside int8
    sig = np.cumsum(rng.uniform(-0.05, 0.05, size=(T, n_sig)), axis=0)
    sig /= max(1.0, np.max(np.abs(sig)))
    gain = {80: 100.0, 310: 400.0, 311: 400.0}.get(fmt, 1000.0)
    rec = str(tmp_path / f"rt{fmt}")
    write_record(rec, sig, fmt=fmt, gain=gain, baseline=3)

    phys, header = rdsamp(rec)
    assert header.signals[0].fmt == fmt
    assert phys.shape == (T, n_sig)
    # quantization error bounded by half an ADC step
    assert np.max(np.abs(phys - sig)) <= 0.5 / gain + 1e-9


def test_write_fmt8_rejects_fast_slew(tmp_path):
    from ptbxl_tpu.io.wfdb_io import write_record

    sig = np.array([[0.0], [10.0]])  # ADC step 10000 >> int8
    with pytest.raises(ValueError, match="int8"):
        write_record(str(tmp_path / "slew"), sig, fmt=8, gain=1000.0)


def test_write_unsupported_format_raises(tmp_path):
    from ptbxl_tpu.io.wfdb_io import write_record

    with pytest.raises(NotImplementedError):
        write_record(str(tmp_path / "w999"), np.zeros((4, 1)), fmt=999)


# ---------------------------------------------------------------- multi-segment

def _write_master(path, name, n_sig, fs, segments):
    """Master .hea: record line 'name/N n_sig fs total' + segment lines."""
    total = sum(n for _, n in segments)
    lines = [f"{name}/{len(segments)} {n_sig} {fs:g} {total}"]
    lines += [f"{s} {n}" for s, n in segments]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_multi_segment_fixed_layout(tmp_path):
    """Fixed layout: segments with the full signal set concatenate in order;
    a '~' null segment reads as NaN rows (wfdb-python semantics)."""
    rng = np.random.default_rng(3)
    s1 = rng.standard_normal((100, 3))
    s2 = rng.standard_normal((60, 3))
    write_record_fmt16(str(tmp_path / "seg01"), s1, fs=500.0, gain=1000.0)
    write_record_fmt16(str(tmp_path / "seg02"), s2, fs=500.0, gain=2000.0)
    _write_master(tmp_path / "multi.hea", "multi", 3, 500.0,
                  [("seg01", 100), ("~", 40), ("seg02", 60)])

    phys, header = rdsamp(str(tmp_path / "multi"))
    assert header.is_multi_segment and header.n_samples == 200
    assert phys.shape == (200, 3)
    assert np.max(np.abs(phys[:100] - s1)) <= 0.5 / 1000.0 + 1e-9
    assert np.isnan(phys[100:140]).all()
    # second segment has its OWN gain; physical values must still match
    assert np.max(np.abs(phys[140:] - s2)) <= 0.5 / 2000.0 + 1e-9


def test_multi_segment_variable_layout(tmp_path):
    """Variable layout: a 0-sample layout segment declares the channel set;
    data segments match channels by description, absent channels are NaN."""
    rng = np.random.default_rng(4)
    # layout segment: 3 channels A, B, C (empty .dat)
    layout_lines = ["lay_layout 3 500 0"]
    for d in ("chanA", "chanB", "chanC"):
        layout_lines.append(f"lay_layout.dat 16 1000(0)/mV 16 0 0 0 0 {d}")
    (tmp_path / "lay_layout.hea").write_text("\n".join(layout_lines) + "\n")
    (tmp_path / "lay_layout.dat").write_bytes(b"")

    full = rng.standard_normal((50, 3))
    write_record_fmt16(str(tmp_path / "segA"), full, fs=500.0, gain=1000.0,
                       descriptions=["chanA", "chanB", "chanC"])
    sub = rng.standard_normal((30, 2))
    write_record_fmt16(str(tmp_path / "segB"), sub, fs=500.0, gain=1000.0,
                       descriptions=["chanC", "chanA"])  # subset, reordered

    _write_master(tmp_path / "vmulti.hea", "vmulti", 3, 500.0,
                  [("lay_layout", 0), ("segA", 50), ("segB", 30)])

    phys, header = rdsamp(str(tmp_path / "vmulti"))
    assert phys.shape == (80, 3)
    assert [s.description for s in header.signals] == ["chanA", "chanB", "chanC"]
    assert np.max(np.abs(phys[:50] - full)) <= 0.5 / 1000.0 + 1e-9
    # segB: chanC -> col 2, chanA -> col 0, chanB absent -> NaN
    assert np.max(np.abs(phys[50:, 2] - sub[:, 0])) <= 0.5 / 1000.0 + 1e-9
    assert np.max(np.abs(phys[50:, 0] - sub[:, 1])) <= 0.5 / 1000.0 + 1e-9
    assert np.isnan(phys[50:, 1]).all()


def test_multi_segment_errors(tmp_path):
    rng = np.random.default_rng(5)
    s1 = rng.standard_normal((20, 2))
    write_record_fmt16(str(tmp_path / "e1"), s1, gain=1000.0)

    # read_adc refuses multi-segment (ADC cache path must never see one)
    _write_master(tmp_path / "m1.hea", "m1", 2, 500.0, [("e1", 20)])
    with pytest.raises(NotImplementedError, match="multi-segment"):
        read_adc(str(tmp_path / "m1"))
    phys, _ = rdsamp(str(tmp_path / "m1"))  # single-segment master still reads
    assert phys.shape == (20, 2)

    # declared length mismatch vs the segment's own header
    _write_master(tmp_path / "m2.hea", "m2", 2, 500.0, [("e1", 25)])
    with pytest.raises(ValueError, match="declares 25"):
        rdsamp(str(tmp_path / "m2"))

    # totals mismatch vs the master record line
    _write_master(tmp_path / "m3.hea", "m3", 2, 500.0, [("e1", 20)])
    txt = (tmp_path / "m3.hea").read_text().splitlines()
    txt[0] = "m3/1 2 500 99"
    (tmp_path / "m3.hea").write_text("\n".join(txt) + "\n")
    with pytest.raises(ValueError, match="master header declares 99"):
        rdsamp(str(tmp_path / "m3"))

    # fixed-layout signal-count mismatch
    _write_master(tmp_path / "m4.hea", "m4", 3, 500.0, [("e1", 20)])
    with pytest.raises(ValueError, match="record declares 3"):
        rdsamp(str(tmp_path / "m4"))
