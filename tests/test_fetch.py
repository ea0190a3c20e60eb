"""Hermetic tests for the PTB-XL mirror fetcher (ptbxl_tpu/data/fetch.py).

Covers the behavior the reference download tool provided (reference:
scripts/01_download_missing_records.py) without any network: missing-pair
scanning, retry-until-success, max_missing capping, atomic writes, and
failure reporting.  The HTTP layer is replaced by an injected opener.
"""

import io
import os
import urllib.error

import pandas as pd
import pytest

from ptbxl_tpu.data.fetch import FetchReport, fetch_missing, fetch_one, scan_missing


def _make_mirror(root, rel_paths, present=()):
    """Write a ptbxl_database.csv naming rel_paths; create files in `present`."""
    os.makedirs(root, exist_ok=True)
    pd.DataFrame({"filename_hr": rel_paths, "ecg_id": range(len(rel_paths))}).to_csv(
        os.path.join(root, "ptbxl_database.csv"), index=False
    )
    for rel in present:
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(b"x")


class FakeHTTP:
    """Scripted opener: maps url -> list of outcomes (bytes or Exception)."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        outcome = self.script[url].pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return io.BytesIO(outcome)


def test_scan_missing_detects_incomplete_pairs(tmp_path):
    root = str(tmp_path)
    _make_mirror(
        root,
        ["records500/00000/00001_hr", "records500/00000/00002_hr", "records500/00000/00003_hr"],
        present=[
            "records500/00000/00001_hr.hea",
            "records500/00000/00001_hr.dat",  # complete
            "records500/00000/00002_hr.hea",  # .dat missing
        ],
    )
    assert scan_missing(root) == [
        "records500/00000/00002_hr",
        "records500/00000/00003_hr",
    ]


def test_scan_missing_requires_csv_and_column(tmp_path):
    with pytest.raises(FileNotFoundError):
        scan_missing(str(tmp_path / "nowhere"))
    root = str(tmp_path / "badcols")
    os.makedirs(root)
    pd.DataFrame({"other": [1]}).to_csv(os.path.join(root, "ptbxl_database.csv"), index=False)
    with pytest.raises(KeyError):
        scan_missing(root)


def test_fetch_one_retries_then_succeeds(tmp_path):
    url = "https://example.org/r.dat"
    dest = str(tmp_path / "sub" / "r.dat")
    http = FakeHTTP({url: [
        urllib.error.HTTPError(url, 503, "busy", None, None),
        ConnectionResetError("boom"),
        b"payload",
    ]})
    logs = []
    ok = fetch_one(url, dest, retries=3, retry_wait=0.0, opener=http, log=logs.append)
    assert ok
    assert open(dest, "rb").read() == b"payload"
    assert len(http.calls) == 3
    assert not os.path.exists(dest + ".part")  # atomic rename, no leftovers


def test_fetch_one_gives_up_after_retries(tmp_path):
    url = "https://example.org/r.hea"
    dest = str(tmp_path / "r.hea")
    http = FakeHTTP({url: [ConnectionResetError("x")] * 2})
    ok = fetch_one(url, dest, retries=2, retry_wait=0.0, opener=http, log=lambda _: None)
    assert not ok
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")


def test_fetch_missing_fills_only_absent_files(tmp_path):
    root = str(tmp_path)
    base = "https://mirror.test/ptbxl/"
    _make_mirror(
        root,
        ["records500/00000/00001_hr", "records500/00000/00002_hr"],
        present=["records500/00000/00002_hr.hea"],  # .dat of 2 missing; 1 fully missing
    )
    http = FakeHTTP({
        base + "records500/00000/00001_hr.hea": [b"h1"],
        base + "records500/00000/00001_hr.dat": [b"d1"],
        base + "records500/00000/00002_hr.dat": [b"d2"],
    })
    report = fetch_missing(root, base, opener=http, log=lambda _: None)
    assert isinstance(report, FetchReport)
    assert (report.missing, report.attempted, report.completed) == (2, 2, 2)
    assert report.failed_records == []
    # the already-present .hea was never re-fetched
    assert base + "records500/00000/00002_hr.hea" not in http.calls
    assert open(os.path.join(root, "records500/00000/00002_hr.dat"), "rb").read() == b"d2"


def test_fetch_missing_caps_and_reports_failures(tmp_path):
    root = str(tmp_path)
    base = "https://mirror.test/ptbxl/"
    rels = [f"records500/00000/0000{i}_hr" for i in (1, 2, 3)]
    _make_mirror(root, rels)
    http = FakeHTTP({
        base + rels[0] + ".hea": [b"h"],
        base + rels[0] + ".dat": [ConnectionResetError("x")] * 3,
        base + rels[1] + ".hea": [b"h"],
        base + rels[1] + ".dat": [b"d"],
    })
    report = fetch_missing(root, base, max_missing=2, retries=3, retry_wait=0.0,
                           opener=http, log=lambda _: None)
    assert report.missing == 3  # full gap count still reported
    assert report.attempted == 2  # capped
    assert report.completed == 1
    assert report.failed_records == [rels[0]]


def test_fetch_missing_noop_on_complete_mirror(tmp_path):
    root = str(tmp_path)
    _make_mirror(root, ["r/1_hr"], present=["r/1_hr.hea", "r/1_hr.dat"])
    http = FakeHTTP({})
    report = fetch_missing(root, opener=http, log=lambda _: None)
    assert (report.missing, report.attempted) == (0, 0)
    assert http.calls == []
