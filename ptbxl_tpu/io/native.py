"""ctypes bindings for the C++ batch WFDB decoder (csrc/wfdb_decode.cpp).

Auto-builds the shared library with make on first use when a C++ toolchain
is available; callers fall back to the pure-Python reader otherwise
(ptbxl_tpu/io/wfdb_io.py is the semantic source of truth).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libwfdbdecode.so")

_lib = None
_build_failed = False


def _make() -> bool:
    try:
        subprocess.run(
            ["make", "-B", "-C", _CSRC], check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) and not _make():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    if not hasattr(lib, "wfdb_gather_rows"):
        # stale prebuilt .so from before the gather entry point: rebuild once
        del lib
        if not _make():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        if not hasattr(lib, "wfdb_gather_rows"):
            _build_failed = True
            return None

    lib.wfdb_decode_batch_fmt16.restype = ctypes.c_int
    lib.wfdb_decode_batch_fmt16.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.wfdb_gather_rows.restype = None
    lib.wfdb_gather_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.wfdb_adc_to_physical.restype = None
    lib.wfdb_adc_to_physical.argtypes = [
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_batch_fmt16(
    dat_paths: List[str],
    n_samples: int,
    n_sig: int,
    out: Optional[np.ndarray] = None,
    n_threads: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode format-16 .dat files -> (adc [n, n_sig, n_samples] int16, ok [n] bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WFDB decoder unavailable (no toolchain?)")

    n = len(dat_paths)
    if out is None:
        out = np.zeros((n, n_sig, n_samples), dtype=np.int16)
    # real raise, not assert: this guards a raw C memwrite and must survive
    # `python -O`
    if (
        out.shape != (n, n_sig, n_samples)
        or out.dtype != np.int16
        or not out.flags.c_contiguous
    ):
        raise ValueError(
            f"out buffer must be C-contiguous int16 {(n, n_sig, n_samples)}; "
            f"got {out.dtype} {out.shape}"
        )

    status = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in dat_paths])
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)

    lib.wfdb_decode_batch_fmt16(
        c_paths, n, n_samples, n_sig,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out, status == 0


def gather_rows(
    src: np.ndarray,
    indices: np.ndarray,
    out: Optional[np.ndarray] = None,
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """Threaded ``out[i] = src[indices[i]]`` over axis 0 of a C-contiguous
    array (works on memmaps; this is the warm-cache batch-assembly hot path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native WFDB decoder unavailable (no toolchain?)")
    if not src.flags.c_contiguous:
        raise ValueError("gather_rows requires a C-contiguous source")
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    n = len(idx)
    if n and (idx.min() < 0 or idx.max() >= src.shape[0]):
        raise IndexError("gather_rows index out of range")
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    if out is None:
        out = np.empty((n,) + src.shape[1:], dtype=src.dtype)
    if not out.flags.c_contiguous or out.dtype != src.dtype or out.shape != (n,) + src.shape[1:]:
        raise ValueError(
            f"out must be C-contiguous {src.dtype} of shape {(n,) + src.shape[1:]}"
        )
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    lib.wfdb_gather_rows(
        ctypes.cast(src.ctypes.data, ctypes.POINTER(ctypes.c_uint8)),
        row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out


def adc_to_physical(
    adc: np.ndarray, gains: np.ndarray, baselines: np.ndarray
) -> np.ndarray:
    """adc [n_sig, T] int16 -> physical float32 with NaN sentinels."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WFDB decoder unavailable")
    adc = np.ascontiguousarray(adc, dtype=np.int16)
    n_sig, t = adc.shape
    gains = np.ascontiguousarray(gains, dtype=np.float32)
    baselines = np.ascontiguousarray(baselines, dtype=np.float32)
    phys = np.empty((n_sig, t), dtype=np.float32)
    lib.wfdb_adc_to_physical(
        adc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n_sig, t,
        gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        baselines.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        phys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return phys
