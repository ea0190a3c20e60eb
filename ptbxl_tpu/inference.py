"""High-level batched inference API (serving surface).

The reference has no inference API beyond its CLI scripts; this gives
framework users a direct programmatic path:

    predictor = Predictor.from_checkpoint("outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    probs = predictor(signals)        # [N, 12, T] raw -> [N, num_labels]

* accepts reference-layout ``[N, 12, T]`` (or channels-last ``[N, T, 12]``)
  raw signals; per-lead z-score runs on device
* engine='auto' picks the fused Pallas kernel for small batches (where it is
  ~5x faster on-chip) and the XLA path for large ones (see bench.py); both
  are numerically gated against the f32 parity path in tests
* fixed-shape jit with automatic padding of the last partial chunk
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptbxl_tpu.models.ecg_cnn import ECGCNN
from ptbxl_tpu.models.params_io import load_checkpoint
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

# crossover measured on v5e (bench.py): pallas wins below ~1k records/chunk
_PALLAS_MAX_BATCH = 512


class Predictor:
    """Batched ECG classifier inference on one chip."""

    def __init__(
        self,
        variables,
        classes: Optional[List[str]] = None,
        num_labels: int = 5,
        feat_dim: int = 256,
        engine: str = "auto",  # 'auto' | 'xla' | 'pallas'
        chunk_size: int = 512,
        normalize: bool = True,
        data_parallel: bool = False,
    ):
        """``data_parallel=True`` shards each chunk's batch axis across all
        devices of a 1-D mesh (GSPMD inserts the collectives); params are
        replicated.  chunk_size must then be divisible by the device count."""
        self.variables = variables
        self.classes = classes
        self.chunk_size = chunk_size
        self.normalize = normalize
        self.engine = engine
        self.model = ECGCNN(feat_dim=feat_dim, num_labels=num_labels)

        self._batch_sharding = None
        if data_parallel:
            from ptbxl_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            mesh = make_mesh(n_model=1)
            n_data = mesh.shape["data"]
            if chunk_size % n_data:
                raise ValueError(
                    f"chunk_size {chunk_size} not divisible by {n_data} devices"
                )
            self._batch_sharding = batch_sharding(mesh)
            self.variables = jax.device_put(self.variables, replicated_sharding(mesh))
            if engine != "xla":
                raise ValueError("data_parallel currently supports engine='xla'")

        self._folded = None
        if engine in ("auto", "pallas"):
            try:
                from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_bn_into_conv

                self._folded = fold_bn_into_conv(variables)
            except Exception:
                if engine == "pallas":
                    raise

        @jax.jit
        def _xla_forward(variables, x):
            h = zscore_per_lead_batch(x) if self.normalize else x
            return jax.nn.sigmoid(self.model.apply(variables, h, False))

        self._xla_forward = _xla_forward

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, num_labels: int = 5, **kwargs) -> "Predictor":
        variables, classes = load_checkpoint(ckpt_path, arch="ecgcnn")
        return cls(variables, classes=classes, num_labels=num_labels, **kwargs)

    def _use_pallas(self, batch: int) -> bool:
        if self.engine == "xla" or self._folded is None:
            return False
        if self.engine == "pallas":
            return True
        return batch <= _PALLAS_MAX_BATCH

    def _forward(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
            return self._xla_forward(self.variables, x)
        if self._use_pallas(x.shape[0]):
            from ptbxl_tpu.ops.pallas.fused_ecgcnn import fused_ecgcnn_probs

            return fused_ecgcnn_probs(x, self._folded, normalize=self.normalize)
        return self._xla_forward(self.variables, x)

    def __call__(self, signals: np.ndarray) -> np.ndarray:
        """signals: [N, 12, T] or [N, T, 12] raw -> probs [N, num_labels]."""
        x = np.asarray(signals, dtype=np.float32)
        if x.ndim == 2:
            x = x[None]
        if x.shape[1] == 12 and x.shape[2] != 12:
            x = x.transpose(0, 2, 1)  # -> channels-last
        n = x.shape[0]

        n_dev = 1
        if self._batch_sharding is not None:
            n_dev = self._batch_sharding.mesh.shape["data"]

        outs = []
        cs = self.chunk_size
        for i0 in range(0, n, cs):
            chunk = x[i0 : i0 + cs]
            real = chunk.shape[0]
            target = cs if (real < cs and n > cs) else real
            if target % n_dev:  # sharded batch axis must divide evenly
                target += n_dev - target % n_dev
            if real < target:
                # pad to the fixed jit shape; surplus rows dropped below
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], target - real, axis=0)])
            probs = np.asarray(self._forward(jnp.asarray(chunk)))
            outs.append(probs[:real])
        return np.concatenate(outs, axis=0)
