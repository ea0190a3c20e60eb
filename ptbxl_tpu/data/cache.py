"""Lossless int16 ADC record cache backing the fast input pipeline.

The reference re-decodes WFDB from disk in every epoch's __getitem__
(reference: src/datasets/ptbxl.py:129-142, via DataLoader workers).  Here the
first pass decodes each record once into a single memory-mapped int16 tensor
``[N, leads, T]`` plus per-lead gain/baseline arrays; every later access is a
memmap slice + affine conversion to physical float32.  This is lossless: WFDB
format 16 stores int16 ADC values, and physical = (adc - baseline) / gain.

Cache files live under ``<base_dir>/.ptbxl_tpu_cache/`` keyed by a hash of the
record list, so distinct splits/filters coexist.  NaN sentinels (-32768) are
restored to NaN on read, matching wfdb semantics.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional, Sequence

import numpy as np

from ptbxl_tpu.data.manifest import CACHE_DIRNAME
from ptbxl_tpu.io.wfdb_io import read_adc

_SENTINEL16 = -32768


def _key(rel_paths: Sequence[str]) -> str:
    h = hashlib.sha1("\n".join(rel_paths).encode()).hexdigest()[:16]
    return h


class ADCCache:
    """Decode-once memmap cache of a fixed record list."""

    def __init__(self, base_dir: str, rel_paths: Sequence[str], cache_dir: Optional[str] = None):
        self.base_dir = base_dir
        self.rel_paths = list(rel_paths)
        self.cache_dir = cache_dir or os.path.join(base_dir, CACHE_DIRNAME)
        self._adc: Optional[np.memmap] = None
        self._gain: Optional[np.ndarray] = None
        self._baseline: Optional[np.ndarray] = None
        self.n_leads = 0
        self.n_samples = 0

    def _paths(self):
        k = _key(self.rel_paths)
        return (
            os.path.join(self.cache_dir, f"adc_{k}.bin"),
            os.path.join(self.cache_dir, f"adc_{k}.meta.npz"),
        )

    def ensure_built(self, verbose: bool = True) -> "ADCCache":
        bin_path, meta_path = self._paths()
        if os.path.exists(bin_path) and os.path.exists(meta_path):
            self._open()
            return self

        os.makedirs(self.cache_dir, exist_ok=True)
        n = len(self.rel_paths)
        first_adc, first_hdr = read_adc(os.path.join(self.base_dir, self.rel_paths[0]))
        T, L = first_adc.shape
        self.n_samples, self.n_leads = T, L

        mm = np.lib.format.open_memmap(
            bin_path + ".tmp", mode="w+", dtype=np.int16, shape=(n, L, T)
        )
        gains = np.empty((n, L), dtype=np.float32)
        baselines = np.empty((n, L), dtype=np.float32)

        for i, rel in enumerate(self.rel_paths):
            if i == 0:
                adc, hdr = first_adc, first_hdr
            else:
                adc, hdr = read_adc(os.path.join(self.base_dir, rel))
                if adc.shape != (T, L):
                    raise ValueError(
                        f"Record {rel} shape {adc.shape} != cache shape {(T, L)}; "
                        "ADCCache requires uniform record length"
                    )
            mm[i] = np.clip(adc.T, -32768, 32767).astype(np.int16)
            gains[i] = [s.gain for s in hdr.signals]
            baselines[i] = [s.effective_baseline for s in hdr.signals]
            if verbose and (i + 1) % 2000 == 0:
                print(f"[ADCCache] decoded {i + 1}/{n} records")

        mm.flush()
        del mm
        np.savez(meta_path, gains=gains, baselines=baselines, n_samples=T, n_leads=L)
        os.replace(bin_path + ".tmp", bin_path)
        self._open()
        if verbose:
            print(f"[ADCCache] built cache for {n} records at {bin_path}")
        return self

    def _open(self):
        bin_path, meta_path = self._paths()
        self._adc = np.load(bin_path, mmap_mode="r")
        meta = np.load(meta_path)
        self._gain = meta["gains"]
        self._baseline = meta["baselines"]
        self.n_samples = int(meta["n_samples"])
        self.n_leads = int(meta["n_leads"])

    def __len__(self):
        return len(self.rel_paths)

    def get_physical(self, indices: Sequence[int]) -> np.ndarray:
        """float32 physical signals [B, leads, T] with NaN for sentinels."""
        if self._adc is None:
            self.ensure_built()
        idx = np.asarray(indices)
        adc = np.asarray(self._adc[idx], dtype=np.float32)  # [B, L, T]
        gain = self._gain[idx][:, :, None]
        baseline = self._baseline[idx][:, :, None]
        phys = (adc - baseline) / gain
        phys[np.asarray(self._adc[idx]) == _SENTINEL16] = np.nan
        return phys
