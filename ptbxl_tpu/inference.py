"""High-level batched inference API (serving surface).

The reference has no inference API beyond its CLI scripts; this gives
framework users a direct programmatic path:

    predictor = Predictor.from_checkpoint("outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    probs = predictor(signals)                  # [N, 12, T] raw -> [N, L]

    mm = Predictor.from_checkpoint("outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz",
                                   arch="multimodal")
    probs = mm(signals, demo=demo_vectors)      # + [N, 5] demographics

* accepts reference-layout ``[N, 12, T]`` (or channels-last ``[N, T, 12]``)
  raw signals; per-lead z-score runs on device
* engine='auto' picks the fused Pallas kernel for small batches (where it is
  ~5x faster on-chip) and the XLA path for large ones (see bench.py); both
  are numerically gated against the f32 parity path in tests
* fixed-shape jit with automatic padding of the last partial chunk
* data_parallel=True shards chunks over all devices of a 1-D mesh
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptbxl_tpu.models.ecg_cnn import ECGCNN
from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal
from ptbxl_tpu.models.params_io import load_checkpoint
from ptbxl_tpu.ops.preprocess import (
    zscore_per_lead_batch,
    zscore_per_lead_batch_onepass,
)

# Engine crossover: the fused single-kernel path wins per-CALL serving below
# this chunk size (one launch vs ~10, everything VMEM-resident); the XLA path
# wins sustained large-batch throughput (packed-bf16 MXU — see
# docs/ARCHITECTURE.md).  Measured on v5e via bench.py; override per
# deployment with PTBXL_TPU_PALLAS_MAX_BATCH after re-running the bench.
import os as _os

_PALLAS_MAX_BATCH = int(_os.environ.get("PTBXL_TPU_PALLAS_MAX_BATCH", "512"))


class Predictor:
    """Batched ECG classifier inference (single- or multi-modal)."""

    def __init__(
        self,
        variables,
        classes: Optional[List[str]] = None,
        num_labels: int = 5,
        feat_dim: int = 256,
        arch: str = "ecgcnn",  # 'ecgcnn' | 'multimodal'
        demo_hidden_dim: int = 64,
        engine: str = "auto",  # 'auto' | 'xla' | 'pallas'
        chunk_size: int = 512,
        normalize: bool = True,
        data_parallel: bool = False,
        precision: str = "highest",  # 'highest' (f32) | 'default' (bf16) | 'int8'
        calib_signals=None,
        int8_layers=None,
        qparams=None,
    ):
        """``data_parallel=True`` shards each chunk's batch axis across all
        devices of a 1-D mesh (GSPMD inserts the collectives); params are
        replicated.  chunk_size must then be divisible by the device count.

        ``precision='default'`` runs the XLA engine with bf16 activations
        (~4.5x the parity path's throughput on v5e; probabilities within
        ~1.5e-3 of f32 — the same configuration bench.py gates at <=5e-3).

        ``precision='int8'`` additionally PTQ-quantizes conv layers to int8
        (BN folded, per-channel scales; see ops/quant.py) — ~1.45x the bf16
        path on v5e at large chunk sizes.  Calibration defaults to the
        ROBUST preset (battery-gated out-of-distribution, quant_eval;
        demo-pack prob delta ~1.6e-2); ``calib_signals`` (raw [N,12,T] or
        [N,T,12]) override it — e.g. quant.demo_pack_signals() tightens
        demo parity to ~3.2e-3 for strictly PTB-XL-like traffic;
        ``int8_layers`` overrides which conv layers are quantized (default:
        the per-arch measured winner — (1,3) for ecgcnn/AF, (3,) for
        multimodal).  ``qparams`` (a
        quantize_model() dict or a save_qparams() .npz path) skips the
        fold+calibrate step entirely — quantize once offline, load fast."""
        self.variables = variables
        self.classes = classes
        self.chunk_size = chunk_size
        self.normalize = normalize
        self.arch = arch
        self._num_labels = num_labels
        if data_parallel and engine == "auto":
            # GSPMD batch sharding is an XLA-path feature; 'auto' resolves to
            # the only engine it supports instead of erroring on the default
            engine = "xla"
        self.engine = engine
        import jax.numpy as _jnp

        if precision == "int8":
            if engine == "pallas":
                raise ValueError(
                    "precision='int8' is an XLA-path feature (Mosaic does not "
                    "engage int8 MXU modes on this backend, docs/ARCHITECTURE.md)"
                )
            engine = self.engine = "xla"
        model_precision = None if precision in ("default", "int8") else precision
        model_dtype = _jnp.bfloat16 if precision in ("default", "int8") else _jnp.float32
        if arch == "multimodal":
            self.model = ECGMultimodal(
                feat_dim=feat_dim, num_labels=num_labels,
                demo_hidden_dim=demo_hidden_dim,
                precision=model_precision, dtype=model_dtype,
            )
        else:
            self.model = ECGCNN(
                feat_dim=feat_dim, num_labels=num_labels,
                precision=model_precision, dtype=model_dtype,
            )

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
            if precision != "int8":  # int8 replicates its own q-params below
                self.variables = jax.device_put(
                    self.variables, replicated_sharding(mesh)
                )
            if engine != "xla":
                raise ValueError("data_parallel currently supports engine='xla'")

        self._quant_forward = None
        if precision == "int8":
            from ptbxl_tpu.ops.quant import (
                load_qparams,
                make_quantized_forward,
                quantize_model,
                split_meta,
            )

            if qparams is not None:
                q = load_qparams(qparams) if isinstance(qparams, str) else qparams
            else:
                q = quantize_model(
                    variables, arch=arch, calib_signals=calib_signals,
                    int8_layers=int8_layers, normalize=normalize,
                )
            arrs, n_blocks, layers = split_meta(q)
            head_labels = int(np.asarray(q["head_w"]).shape[1])
            if head_labels != num_labels:
                # the quantized forward never touches the flax model, so the
                # usual ScopeParamShapeError would not fire — check loudly
                raise ValueError(
                    f"checkpoint head has {head_labels} labels but "
                    f"num_labels={num_labels} was requested"
                )
            if self._batch_sharding is not None:
                from ptbxl_tpu.parallel.mesh import replicated_sharding

                arrs = jax.device_put(
                    arrs, replicated_sharding(self._batch_sharding.mesh)
                )
            self._q_arrs = arrs
            self._quant_forward = jax.jit(
                make_quantized_forward(n_blocks, layers, arch=arch, normalize=normalize)
            )

        self._folded = None
        if (
            engine in ("auto", "pallas")
            and self._batch_sharding is None
            and precision != "int8"
        ):
            try:
                from ptbxl_tpu.ops.pallas.fused_ecgcnn import (
                    fold_bn_into_conv,
                    fold_multimodal,
                )

                fold = fold_multimodal if arch == "multimodal" else fold_bn_into_conv
                self._folded = fold(variables)
            except Exception:
                if engine == "pallas":
                    raise

        # perf precisions normalize with the fused one-pass moment form
        # (single HBM read for both moments — tools/probe_zscore.py); the
        # 'highest' parity path keeps the exact two-pass reference form
        _zs = (zscore_per_lead_batch if precision == "highest"
               else zscore_per_lead_batch_onepass)

        if self._quant_forward is not None:
            self._xla_forward = None  # _forward always takes the quant branch
        elif arch == "multimodal":

            @jax.jit
            def _xla_forward(variables, x, d):
                h = _zs(x) if self.normalize else x
                logits = self.model.apply(variables, h, d, False)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._xla_forward = _xla_forward
        else:

            @jax.jit
            def _xla_forward(variables, x):
                h = _zs(x) if self.normalize else x
                logits = self.model.apply(variables, h, False)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._xla_forward = _xla_forward

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, num_labels: int = 5, arch: str = "ecgcnn", **kwargs
    ) -> "Predictor":
        variables, classes = load_checkpoint(ckpt_path, arch=arch)
        return cls(variables, classes=classes, num_labels=num_labels, arch=arch, **kwargs)

    def _use_pallas(self, batch: int) -> bool:
        if self.engine == "xla" or self._folded is None:
            return False
        if self.engine == "pallas":
            return True
        return batch <= _PALLAS_MAX_BATCH

    def _forward(self, x: jnp.ndarray, d: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
            if d is not None:
                d = jax.device_put(d, self._batch_sharding)
        elif self._quant_forward is None and self._use_pallas(x.shape[0]):
            from ptbxl_tpu.ops.pallas.fused_ecgcnn import (
                fused_ecgcnn_probs,
                fused_multimodal_probs,
            )

            if self.arch == "multimodal":
                return fused_multimodal_probs(x, d, self._folded, normalize=self.normalize)
            return fused_ecgcnn_probs(x, self._folded, normalize=self.normalize)
        if self._quant_forward is not None:
            if self.arch == "multimodal":
                return self._quant_forward(self._q_arrs, x, d)
            return self._quant_forward(self._q_arrs, x)
        if self.arch == "multimodal":
            return self._xla_forward(self.variables, x, d)
        return self._xla_forward(self.variables, x)

    def __call__(self, signals: np.ndarray, demo: Optional[np.ndarray] = None) -> np.ndarray:
        """signals: [N, 12, T] or [N, T, 12] raw (+ demo [N, 5] for
        multimodal) -> probs [N, num_labels]."""
        x = np.asarray(signals, dtype=np.float32)
        if x.ndim == 2:
            x = x[None]
        if x.shape[1] == 12 and x.shape[2] != 12:
            x = x.transpose(0, 2, 1)  # -> channels-last
        n = x.shape[0]

        if self.arch == "multimodal":
            if demo is None:
                raise ValueError("multimodal Predictor requires demo vectors")
            demo = np.asarray(demo, dtype=np.float32)
            if demo.ndim == 1:
                demo = demo[None]
            if demo.shape != (n, 5):
                raise ValueError(
                    f"demo must be [N, 5] matching signals N={n}; got {demo.shape}"
                )

        if n == 0:
            return np.empty((0, self._num_labels), np.float32)

        n_dev = 1
        if self._batch_sharding is not None:
            n_dev = self._batch_sharding.mesh.shape["data"]

        outs = []
        cs = self.chunk_size
        for i0 in range(0, n, cs):
            chunk = x[i0 : i0 + cs]
            d_chunk = demo[i0 : i0 + cs] if demo is not None else None
            real = chunk.shape[0]
            if real < cs and n > cs:
                target = cs
            elif real < cs:
                # bucket small one-shot batches to the next power of two so a
                # serving host with varying small N compiles O(log cs) shapes,
                # not one per distinct N (pad rows are masked out below)
                target = 1 << (real - 1).bit_length() if real > 1 else 1
            else:
                target = real
            if target % n_dev:  # sharded batch axis must divide evenly
                target += n_dev - target % n_dev
            if real < target:
                # pad to the fixed jit shape; surplus rows dropped below
                pad = target - real
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
                if d_chunk is not None:
                    d_chunk = np.concatenate([d_chunk, np.repeat(d_chunk[-1:], pad, axis=0)])
            probs = np.asarray(
                self._forward(
                    jnp.asarray(chunk),
                    jnp.asarray(d_chunk) if d_chunk is not None else None,
                )
            )
            outs.append(probs[:real])
        return np.concatenate(outs, axis=0)
