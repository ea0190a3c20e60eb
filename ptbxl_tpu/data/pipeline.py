"""Batch pipeline: shuffle, fixed-shape padded batches, device prefetch.

Differences from the reference's torch DataLoader (scripts/03:107-118),
dictated by XLA's static-shape compilation model:

* the last partial batch is PADDED to the full batch size and carries a
  ``mask`` [B] so loss/metrics ignore padding (torch ran ragged batches;
  under jit that would trigger a recompile per ragged shape)
* batches are channels-last ``[B, T, leads]`` float32, raw (un-normalized) —
  the per-lead z-score is fused on device (ops/preprocess.py)
* a background thread prefetches + ``jax.device_put``s the next batch with the
  data-parallel sharding while the current step runs (overlaps H2D with
  compute; the reference relied on DataLoader worker processes)
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class _ParallelRecordReader:
    """Per-batch parallel decode for datasets WITHOUT an ADC cache.

    The reference overlapped decode with compute via DataLoader worker
    processes (reference: scripts/03_train_ecg_baseline.py:107-118).  The
    cache-less fallback here does the equivalent inside the prefetch thread:
    single-file fmt-16 records (every PTB-XL record) batch-decode through the
    threaded C++ decoder; anything else goes through a thread pool over the
    python reader.
    """

    def __init__(self, ds, n_threads: Optional[int] = None):
        self.ds = ds
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._pool: Optional[ThreadPoolExecutor] = None
        self._native = None
        try:
            from ptbxl_tpu.io import native

            if native.available():
                self._native = native
        except Exception:  # no toolchain
            self._native = None
        self._hdr: Dict[int, Optional[tuple]] = {}

    def _header(self, idx: int):
        """Memoized (dat_path, gains, baselines, T, L) or None if not
        native-decodable."""
        if idx not in self._hdr:
            info = None
            try:
                from ptbxl_tpu.io.wfdb_io import read_header

                rec = self.ds.record_path(idx)
                h = read_header(rec)
                plain = len({s.file_name for s in h.signals}) == 1 and all(
                    s.fmt == 16 and s.byte_offset == 0
                    and s.samps_per_frame == 1 and s.skew == 0
                    for s in h.signals
                )
                if plain:
                    info = (
                        os.path.join(os.path.dirname(rec), h.signals[0].file_name),
                        np.array([s.gain for s in h.signals], np.float32),
                        np.array([s.effective_baseline for s in h.signals], np.float32),
                        h.n_samples,
                        h.n_sig,
                    )
            except Exception:
                info = None
            self._hdr[idx] = info
        return self._hdr[idx]

    def read(self, idx: np.ndarray) -> np.ndarray:
        """Decode the batch -> physical float32 [B, leads, T]."""
        if self._native is not None:
            infos = [self._header(int(i)) for i in idx]
            if all(i is not None for i in infos) and len({i[3:] for i in infos}) == 1:
                t, l = infos[0][3], infos[0][4]
                adc, ok = self._native.decode_batch_fmt16(
                    [i[0] for i in infos], t, l, n_threads=self.n_threads
                )  # [B, L, T] int16
                if ok.all():
                    gains = np.stack([i[1] for i in infos])[:, :, None]
                    bases = np.stack([i[2] for i in infos])[:, :, None]
                    phys = (adc.astype(np.float32) - bases) / gains
                    phys[adc == -32768] = np.nan
                    return phys
        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.n_threads)
        return np.stack(list(self._pool.map(self.ds.get_raw, [int(i) for i in idx])))


class BatchSource:
    """Assembles host batches from a dataset (optionally via an ADCCache)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        seed: int = 42,
        use_adc_cache: bool = True,
        emit_adc: bool = False,
    ):
        """``emit_adc=True`` ships raw int16 ADC + per-lead gain/baseline and
        leaves physical conversion to the device (ops/adc_convert.py): half
        the H2D bytes of the float32 path.  Requires the ADC cache."""
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.n = len(dataset)
        self.has_demo = hasattr(dataset, "demo")
        self._cache = None
        if use_adc_cache and self.n > 0:
            from ptbxl_tpu.data.cache import ADCCache

            try:
                self._cache = ADCCache(
                    dataset.base_dir, dataset.df["filename_hr"].tolist()
                ).ensure_built()
            except Exception as e:  # non-uniform lengths etc. -> per-record reads
                print(f"[BatchSource] ADC cache unavailable ({e}); falling back to per-record reads")
                self._cache = None
        self.emit_adc = emit_adc and self._cache is not None
        self._reader = None if self._cache is not None else _ParallelRecordReader(dataset)
        if self._cache is not None:
            from ptbxl_tpu.data.cache import gather_records

            self._gather = gather_records

    @property
    def steps_per_epoch(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size

    def _signals(self, idx: np.ndarray) -> np.ndarray:
        if self._cache is not None:
            return self._cache.get_physical(idx)  # [B, L, T]
        return self._reader.read(idx)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(order)

        bs = self.batch_size
        for start in range(0, self.n, bs):
            idx = order[start : start + bs]
            real = len(idx)
            if real < bs:  # pad to fixed shape
                # pad by WRAPPING the epoch order (distinct records), not by
                # repeating one row: the mask shields loss/metrics either
                # way, but train-mode BatchNorm statistics see the pad rows,
                # and 50 copies of one record skews them far more than a
                # representative sample does (see docs/PARITY.md)
                pad = np.resize(order, bs - real) if self.n else np.repeat(idx[-1:], bs - real)
                idx = np.concatenate([idx, pad])
            batch = {
                "y": self.ds.y[idx].astype(np.float32),
                "mask": (np.arange(bs) < real).astype(np.float32),
            }
            if self.emit_adc:
                c = self._cache
                # ship the memmap's native [B, L, T] layout untouched: the
                # host does ONLY the gather (threaded C++ when available);
                # transpose+convert run on device
                batch["adc_lt"] = self._gather(c._adc, idx)
                batch["gain"] = c._gain[np.asarray(idx)]
                batch["baseline"] = c._baseline[np.asarray(idx)]
            else:
                sig = self._signals(idx)  # [B, L, T]
                batch["ecg"] = np.ascontiguousarray(
                    sig.transpose(0, 2, 1), dtype=np.float32
                )
            if self.has_demo:
                batch["demo"] = self.ds.demo[idx].astype(np.float32)
            yield batch


def device_prefetch(
    host_iter: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    depth: int = 2,
) -> Iterator[Dict]:
    """Move batches to device ahead of consumption (double buffering).

    ``sharding`` is a jax.sharding.Sharding pytree-prefix (typically a
    NamedSharding with the batch axis on the mesh's 'data' axis).
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    convert = None

    def put(batch):
        nonlocal convert
        if sharding is not None:
            dev = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        else:
            dev = {k: jax.device_put(v) for k, v in batch.items()}
        if "adc_lt" in dev:  # int16 transfer path: transpose+convert on device
            if convert is None:
                from ptbxl_tpu.ops.adc_convert import adc_lt_to_physical_batch

                convert = jax.jit(adc_lt_to_physical_batch)
            dev["ecg"] = convert(dev.pop("adc_lt"), dev.pop("gain"), dev.pop("baseline"))
        return dev

    error = []
    closed = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator — otherwise the producer blocks forever holding
        # device-resident batches (leaked HBM for the process lifetime)
        while not closed.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in host_iter:
                if not _put(put(batch)):
                    return
        except BaseException as e:  # propagate to the consumer, don't truncate
            error.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if error:
                    raise error[0]
                break
            yield item
    finally:
        # consumer done or abandoned (GeneratorExit/exception): release the
        # producer and drop any queued device batches
        closed.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
