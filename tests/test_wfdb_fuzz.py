"""Bounded randomized fuzz of the WFDB codec (VERDICT r4 item 5).

tools/fuzz_wfdb.py generates random records across every standard format and
edge axis (odd counts, samps_per_frame, skew, byte_offset, sentinels,
multi-segment), packs them with INDEPENDENT scalar spec-packers, and checks
read_adc/rdsamp against a from-first-principles oracle.  This test runs a
bounded slice in-suite; the tool's wfdb-python differential branch runs in
the goldens env (where wfdb is importable).  4x400 trials across seeds 0-3
passed at authoring time; any future failure lands a fixture under
tests/fixtures/fuzz/ for permanent regression coverage.
"""

import glob
import os
import sys
import tempfile

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

import fuzz_wfdb  # noqa: E402


def test_fuzz_bounded():
    rng = np.random.default_rng(1234)
    with tempfile.TemporaryDirectory() as d:
        for t in range(120):
            errs = fuzz_wfdb.run_trial(rng, d, t, use_wfdb=False)
            assert not errs, errs[0][1]


def test_fuzz_packers_are_independent():
    """The fuzz oracle's packers must disagree with the codec's encoders at
    the implementation level (scalar vs vectorized) yet agree at the byte
    level — spot-check bytes for every packed format."""
    from ptbxl_tpu.io.wfdb_io import _ENCODERS

    rng = np.random.default_rng(7)
    for fmt in (16, 24, 32, 61, 80, 160, 212, 310, 311):
        lo, hi = fuzz_wfdb.RANGES[fmt]
        vals = rng.integers(lo, hi + 1, size=31, dtype=np.int64)
        ours = fuzz_wfdb.PACKERS[fmt](vals.tolist())
        theirs = _ENCODERS[fmt](vals)
        assert ours == theirs, f"fmt {fmt}: packer/encoder byte mismatch"


def test_fuzz_fixtures_replay():
    """Any fixture a past fuzz failure checked in must decode correctly now."""
    fixture_heas = glob.glob(os.path.join(fuzz_wfdb.FIXTURE_DIR, "*.hea"))
    if not fixture_heas:
        pytest.skip("no fuzz-failure fixtures checked in (good)")
    from ptbxl_tpu.io.wfdb_io import rdsamp

    for hea in fixture_heas:
        phys, hdr = rdsamp(hea[:-4])
        assert phys.shape[0] == hdr.n_samples
