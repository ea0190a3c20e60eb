"""Tracing / profiling utilities (SURVEY.md §5: absent in the reference).

* ``StepTimer`` — wall-clock per-step timing with records/sec reporting;
  enabled in the trainer via PTBXL_TPU_PERF=1 (keeps default output identical
  to the reference's print flow).
* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace; enable with PTBXL_TPU_TRACE=<dir>.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


def perf_enabled() -> bool:
    return os.environ.get("PTBXL_TPU_PERF", "") not in ("", "0")


class StepTimer:
    """Accumulates (records, seconds) across steps of one epoch."""

    def __init__(self):
        self.records = 0.0
        self.seconds = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_records: float):
        if self._t0 is None:
            return
        self.seconds += time.perf_counter() - self._t0
        self.records += n_records
        self._t0 = None

    @property
    def records_per_sec(self) -> float:
        return self.records / self.seconds if self.seconds > 0 else 0.0

    def report(self, label: str) -> str:
        return f"[PERF] {label}: {self.records:.0f} records in {self.seconds:.2f}s -> {self.records_per_sec:.1f} rec/s"


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    log_dir = log_dir or os.environ.get("PTBXL_TPU_TRACE")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
