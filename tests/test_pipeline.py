"""Batch pipeline: cache equivalence, padding/masking, prefetch, device ops."""

import os

import numpy as np
import pytest

from ptbxl_tpu.data import PTBXLDataset, PTBXLECGMultimodalDataset
from ptbxl_tpu.data.cache import ADCCache
from ptbxl_tpu.data.datasets import zscore_per_lead
from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def test_adc_cache_matches_direct_reads(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    cache = ADCCache(ptbxl_dir, ds.df["filename_hr"].tolist()).ensure_built()
    for i in (0, 5, len(ds) - 1):
        direct = ds.get_raw(i)  # [12, T]
        cached = cache.get_physical([i])[0]
        np.testing.assert_allclose(cached, direct, atol=1e-6)


def test_cacheless_parallel_reader_matches_cache_path(ptbxl_dir):
    """The no-cache fallback (threaded native batch decode, or thread-pool
    python reads) must produce byte-identical batches to the cache path."""
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    bs = 8
    src_cache = BatchSource(ds, bs, shuffle=False, use_adc_cache=True)
    src_plain = BatchSource(ds, bs, shuffle=False, use_adc_cache=False)
    assert src_plain._cache is None and src_plain._reader is not None
    for b_c, b_p in zip(src_cache.epoch(0), src_plain.epoch(0)):
        np.testing.assert_allclose(b_p["ecg"], b_c["ecg"], atol=1e-6)
        np.testing.assert_array_equal(b_p["y"], b_c["y"])
        np.testing.assert_array_equal(b_p["mask"], b_c["mask"])


def test_parallel_reader_python_fallback(ptbxl_dir, monkeypatch):
    """With the native decoder unavailable, the thread-pool python path must
    produce the same signals."""
    from ptbxl_tpu.data import pipeline as pl_mod

    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    reader = pl_mod._ParallelRecordReader(ds)
    reader._native = None  # force python path
    idx = np.array([0, 3, 5])
    got = reader.read(idx)
    want = np.stack([ds.get_raw(int(i)) for i in idx])
    np.testing.assert_allclose(got, want, atol=0)


def test_batch_shapes_and_padding(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    bs = 8
    src = BatchSource(ds, batch_size=bs, shuffle=False)
    batches = list(src.epoch(0))
    assert len(batches) == src.steps_per_epoch
    n = len(ds)
    for b in batches:
        assert b["ecg"].shape == (bs, 512, 12)
        assert b["y"].shape == (bs, 5)
        assert b["mask"].shape == (bs,)
    total_real = sum(int(b["mask"].sum()) for b in batches)
    assert total_real == n
    # last batch's padding masked out
    last = batches[-1]
    n_last = n - (len(batches) - 1) * bs
    np.testing.assert_array_equal(last["mask"][:n_last], 1.0)
    np.testing.assert_array_equal(last["mask"][n_last:], 0.0)


def test_shuffle_determinism(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    a = [b["y"] for b in BatchSource(ds, 8, True, seed=7).epoch(3)]
    b = [b["y"] for b in BatchSource(ds, 8, True, seed=7).epoch(3)]
    c = [b["y"] for b in BatchSource(ds, 8, True, seed=7).epoch(4)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_multimodal_batches_carry_demo(ptbxl_dir):
    ds = PTBXLECGMultimodalDataset(ptbxl_dir, "train", CLASSES)
    src = BatchSource(ds, 8, False)
    b = next(iter(src.epoch(0)))
    assert b["demo"].shape == (8, 5)


def test_device_prefetch_and_zscore(ptbxl_dir):
    import jax
    import jax.numpy as jnp

    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    src = BatchSource(ds, 8, False)
    dev_batches = list(device_prefetch(src.epoch(0)))
    assert len(dev_batches) == src.steps_per_epoch

    b = dev_batches[0]
    normed = jax.jit(zscore_per_lead_batch)(b["ecg"])
    # matches the reference's host z-score on each sample
    host = np.stack([zscore_per_lead(ds.get_raw(i)).T for i in range(8)])
    np.testing.assert_allclose(np.asarray(normed), host, atol=2e-4)


def test_prefetch_propagates_producer_errors():
    def broken():
        yield {"ecg": np.zeros((2, 8, 12), np.float32)}
        raise RuntimeError("disk on fire")

    it = device_prefetch(broken())
    next(it)
    with pytest.raises(RuntimeError, match="disk on fire"):
        list(it)


def test_zscore_matches_host_math():
    import jax

    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 100, 12)).astype(np.float32) * 3 + 1
    got = np.asarray(jax.jit(zscore_per_lead_batch)(x))
    want = np.stack([zscore_per_lead(s.T).T for s in x])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zscore_onepass_matches_twopass():
    """The perf-path one-pass moment form (E[x^2]-E[x]^2, single fused HBM
    read — shipped in the quant/bf16 serving forwards, tools/probe_zscore.py)
    stays within f32 noise of the exact two-pass parity form, including with
    the large baseline offsets where cancellation bites, a constant (zero
    -variance) lead, and a bf16 wire batch."""
    import jax
    import jax.numpy as jnp

    from ptbxl_tpu.ops.preprocess import (
        zscore_per_lead_batch,
        zscore_per_lead_batch_onepass,
    )

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 5000, 12)) * 2.5 + 40.0).astype(np.float32)
    x[1, :, 3] = 7.25  # constant lead: var==0 must not produce NaN
    want = np.asarray(jax.jit(zscore_per_lead_batch)(x))
    got = np.asarray(jax.jit(zscore_per_lead_batch_onepass)(x))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-4)

    xb = jnp.asarray(x, jnp.bfloat16)
    got_b = np.asarray(jax.jit(zscore_per_lead_batch_onepass)(xb))
    want_b = np.asarray(jax.jit(zscore_per_lead_batch)(xb.astype(jnp.float32)))
    assert got_b.dtype == np.float32  # f32 accumulation regardless of wire
    np.testing.assert_allclose(got_b, want_b, atol=5e-4)


def test_padding_wraps_distinct_records(ptbxl_dir):
    """Final-batch pads come from the epoch order (distinct records), not 50
    copies of one row — train-mode BN statistics stay ~unbiased (PARITY.md)."""
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    n = len(ds)
    bs = n - 3  # one full batch impossible: second batch is 3 real + pads
    src = BatchSource(ds, batch_size=bs, shuffle=False)
    last = list(src.epoch(0))[-1]
    pad_rows = last["ecg"][3:]
    if pad_rows.shape[0] >= 2:
        # wrapped pads are record 0, 1, 2, ... — not all identical
        assert not np.allclose(pad_rows[0], pad_rows[1])
        np.testing.assert_allclose(pad_rows[0], ds.get_raw(0).T, atol=1e-6)


def test_prefetch_abandoned_consumer_releases_producer(ptbxl_dir):
    """Breaking out of a prefetch loop must not leave the producer thread
    blocked forever holding device batches (HBM leak)."""
    import threading
    import time

    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    src = BatchSource(ds, batch_size=4, shuffle=False)
    before = {t.ident for t in threading.enumerate()}
    gen = device_prefetch(src.epoch(0), depth=1)
    next(gen)  # start the producer, consume one batch
    gen.close()  # abandon mid-epoch
    deadline = time.time() + 10.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "prefetch producer thread still alive after close()"


def test_adc_cache_invalidated_by_content_change(ptbxl_dir, tmp_path):
    """Replacing a .dat in place (same name) must rebuild the cache."""
    import os
    import shutil

    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    rels = ds.df["filename_hr"].tolist()[:4]
    cache_dir = str(tmp_path / "cache")
    c1 = ADCCache(ptbxl_dir, rels, cache_dir=cache_dir).ensure_built(verbose=False)
    bin1, _ = c1._paths()

    dat = os.path.join(ptbxl_dir, rels[0]) + ".dat"
    raw = open(dat, "rb").read()
    shutil.copy(dat, dat + ".bak")
    try:
        with open(dat, "wb") as f:  # flip bytes, same size
            f.write(bytes(b ^ 0xFF for b in raw))
        os.utime(dat, ns=(os.stat(dat).st_atime_ns, os.stat(dat).st_mtime_ns + 10**9))
        c2 = ADCCache(ptbxl_dir, rels, cache_dir=cache_dir).ensure_built(verbose=False)
        bin2, _ = c2._paths()
        assert bin1 != bin2, "cache key unchanged after .dat content change"
    finally:
        shutil.move(dat + ".bak", dat)


def test_adc_cache_rejects_legit_minus32768_in_wide_formats(tmp_path):
    """fmt-32 can legitimately contain amplitude -32768; the int16 cache would
    silently read it back as NaN (its sentinel), so the build must refuse."""
    import numpy as np
    import pytest

    from ptbxl_tpu.io.wfdb_io import write_record

    root = str(tmp_path / "wide")
    rel = "records500/00000/w1_hr"
    sig = np.zeros((64, 2), np.float32)
    sig[5, 0] = -32.768  # gain 1000 -> ADC exactly -32768
    write_record(os.path.join(root, rel), sig, fmt=32, gain=1000.0)

    cache = ADCCache(root, [rel], cache_dir=str(tmp_path / "cache"))
    with pytest.raises(ValueError, match="-32768"):
        cache.ensure_built(verbose=False)


def test_adc_cache_keeps_fmt16_sentinel_roundtrip(tmp_path):
    """In fmt 16, -32768 IS WFDB's missing marker: the cache stores it and
    get_physical restores NaN — same as the direct read path."""
    import numpy as np

    from ptbxl_tpu.io.wfdb_io import rdsamp, write_record_fmt16

    root = str(tmp_path / "f16")
    rel = "records500/00000/s1_hr"
    sig = np.zeros((64, 2), np.float32)
    write_record_fmt16(os.path.join(root, rel), sig, gain=1000.0)
    # patch one stored sample to the sentinel
    path = os.path.join(root, rel) + ".dat"
    raw = bytearray(open(path, "rb").read())
    raw[0:2] = (-32768).to_bytes(2, "little", signed=True)
    open(path, "wb").write(bytes(raw))

    cache = ADCCache(root, [rel], cache_dir=str(tmp_path / "cache")).ensure_built(
        verbose=False
    )
    phys = cache.get_physical([0])[0]  # [L, T]
    direct, _ = rdsamp(os.path.join(root, rel))  # [T, L]
    assert np.isnan(phys[0, 0]) and np.isnan(direct[0, 0])
