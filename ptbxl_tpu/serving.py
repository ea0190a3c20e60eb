"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference deploys a model by shipping its Python source plus a ``.pth``
file and re-instantiating ``nn.Module``s on the serving host (reference:
scripts/06_ecg_baseline_test.py:69-84).  A TPU-native framework can do
better: export the trained model ONCE into a self-contained, versioned
StableHLO artifact — weights baked in, per-lead z-score preprocessing
included, batch dimension symbolic — and serve it anywhere jax runs, with no
model code, no Flax, and no checkpoint format on the serving host.

    from ptbxl_tpu.serving import export_serving_artifact, ServingModel

    export_serving_artifact("outputs/ecg_baseline/ckpts/ecg_baseline_best.npz",
                            "/models/ecg_baseline.stablehlo")

    model = ServingModel("/models/ecg_baseline.stablehlo")
    probs = model(signals)            # [N, 12, T] or [N, T, 12] -> [N, L]

Artifacts are exported for BOTH cpu and tpu lowering platforms by default,
so the same file serves on a TPU pod and in a CPU canary.  The forward is
the XLA engine (the large-batch throughput winner — docs/ARCHITECTURE.md);
the batch dimension is a symbolic shape, so one artifact serves any batch
size without recompilation at export time.
"""

from __future__ import annotations

import json
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"PTBXLSRV1\n"


def _build_forward(variables, arch: str, num_labels: int, feat_dim: int,
                   demo_hidden_dim: int, normalize: bool, precision: str,
                   int8_layers=None, calib_signals=None, qparams=None):
    """The same forward the Predictor's XLA engine runs, params closed over."""
    import jax
    import jax.numpy as jnp

    from ptbxl_tpu.models.ecg_cnn import ECGCNN
    from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal
    from ptbxl_tpu.ops.preprocess import (
        zscore_per_lead_batch,
        zscore_per_lead_batch_onepass,
    )

    if precision == "int8":
        # PTQ path (ops/quant.py): deep conv int8, BN folded, calibrated at
        # export time on the robust preset (the round-4 battery-gated
        # default; override via calib_signals/qparams); int8 weights and
        # scales are baked into the StableHLO module like any other constant.
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
                variables, arch=arch, normalize=normalize,
                calib_signals=calib_signals, int8_layers=int8_layers,
            )
        arrs, n_blocks, layers = split_meta(q)
        # the quantized forward is built purely from checkpoint arrays, so
        # validate the declared head size loudly (the flax paths fail with a
        # ScopeParamShapeError on the same operator mistake)
        head_labels = int(np.asarray(q["head_w"]).shape[1])
        if head_labels != num_labels:
            raise ValueError(
                f"checkpoint head has {head_labels} labels but num_labels="
                f"{num_labels} was requested"
            )
        qf = make_quantized_forward(n_blocks, layers, arch=arch, normalize=normalize)
        if arch == "multimodal":

            def forward(x, d):
                return qf(arrs, x, d)

        else:

            def forward(x):
                return qf(arrs, x)

        forward.int8_layers = layers
        return forward

    model_precision = None if precision == "default" else precision
    model_dtype = jnp.bfloat16 if precision == "default" else jnp.float32
    # perf precisions ship the fused one-pass moment normalization (single
    # HBM read for both moments — tools/probe_zscore.py); 'highest' keeps
    # the exact two-pass parity form
    zs = (zscore_per_lead_batch if precision == "highest"
          else zscore_per_lead_batch_onepass)
    if arch == "multimodal":
        model = ECGMultimodal(
            feat_dim=feat_dim, num_labels=num_labels,
            demo_hidden_dim=demo_hidden_dim,
            precision=model_precision, dtype=model_dtype,
        )

        def forward(x, d):
            h = zs(x) if normalize else x
            logits = model.apply(variables, h, d, False)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

    else:
        model = ECGCNN(
            feat_dim=feat_dim, num_labels=num_labels,
            precision=model_precision, dtype=model_dtype,
        )

        def forward(x):
            h = zs(x) if normalize else x
            logits = model.apply(variables, h, False)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

    return forward


def _build_cam_forward(variables, arch: str, num_labels: int, feat_dim: int,
                       demo_hidden_dim: int, normalize: bool,
                       n_samples: int, precision: str):
    """(probs, all-class CAMs) forward for the interpretable artifact.

    Uses the one-pass multi-class Grad-CAM (features + tail vjp once,
    vmapped one-hot cotangents) with the demo-variant normalization
    (interpolate -> min-max, eps 1e-9 — reference:
    scripts/00_demo_inference.py:52-61)."""
    import jax.numpy as jnp

    from ptbxl_tpu.interpret.grad_cam import GradCAM
    from ptbxl_tpu.models.ecg_cnn import ECGCNN
    from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal
    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

    model_precision = None if precision == "default" else precision
    model_dtype = jnp.bfloat16 if precision == "default" else jnp.float32
    if arch == "multimodal":
        model = ECGMultimodal(feat_dim=feat_dim, num_labels=num_labels,
                              demo_hidden_dim=demo_hidden_dim,
                              precision=model_precision, dtype=model_dtype)
    else:
        model = ECGCNN(feat_dim=feat_dim, num_labels=num_labels,
                       precision=model_precision, dtype=model_dtype)
    gc = GradCAM(model, variables, signal_length=n_samples, norm_first=False,
                 eps=1e-9, multimodal=(arch == "multimodal"))
    multi = gc._build_multi()
    class_indices = jnp.arange(num_labels, dtype=jnp.int32)

    if arch == "multimodal":

        def forward(x, d):
            h = zscore_per_lead_batch(x) if normalize else x
            probs, cams = multi(h.astype(model_dtype), class_indices, d)
            # [n_classes, B, T] -> [B, n_classes, T]; f32 at the boundary
            return (probs.astype(jnp.float32),
                    jnp.transpose(cams, (1, 0, 2)).astype(jnp.float32))

    else:

        def forward(x):
            h = zscore_per_lead_batch(x) if normalize else x
            probs, cams = multi(h.astype(model_dtype), class_indices)
            return (probs.astype(jnp.float32),
                    jnp.transpose(cams, (1, 0, 2)).astype(jnp.float32))

    return forward


def export_serving_artifact(
    ckpt_path: str,
    out_path: str,
    arch: str = "ecgcnn",  # 'ecgcnn' | 'multimodal'
    num_labels: int = 5,
    feat_dim: int = 256,
    demo_hidden_dim: int = 64,
    n_samples: int = 5000,
    n_leads: int = 12,
    normalize: bool = True,
    precision: str = "highest",  # 'highest' (f32) | 'default' (bf16) | 'int8' (PTQ)
    platforms: Optional[Sequence[str]] = None,  # default ('cpu', 'tpu')
    with_cam: bool = False,
    engine: str = "xla",  # 'xla' | 'pallas' (fused single-kernel, tpu-only)
    batch_size: Optional[int] = None,
    data_parallel: bool = False,
    int8_layers: Optional[Sequence[int]] = None,
    calib_signals=None,
    qparams=None,
) -> str:
    """Export a checkpoint to a self-contained serving artifact.

    The artifact embeds: the serialized StableHLO module (weights as
    constants), the class names, and the input contract.  With
    ``with_cam=True`` the module returns ``(probs [B, L], cams [B, L, T])``
    — interpretable serving with every class's Grad-CAM in one call.

    ``precision='int8'`` accepts the same tuning knobs as the Predictor:
    ``int8_layers`` (which conv layers quantize), ``calib_signals`` (raw
    [N,12,T]/[N,T,12] calibration set; default: the robust battery-gated
    preset, ops/quant.default_calib_signals), or ``qparams`` (a
    quantize_model() dict / save_qparams() path, skipping fold+calibrate
    entirely).

    ``engine='pallas'`` exports the fused single-kernel forward — the
    latency-regime winner (~5x XLA below batch ~512, one launch,
    everything VMEM-resident; docs/ARCHITECTURE.md).  The Mosaic kernel is a
    TPU custom call, so the artifact is tpu-only and the batch dimension is
    FIXED at ``batch_size`` (default 8); ``ServingModel`` chunks and pads
    inputs to that size transparently.

    ``data_parallel=True`` exports the forward jitted over a 1-D 'data' mesh
    spanning ALL devices visible at export time: the artifact embeds the
    GSPMD sharding, and serving it requires (and uses) the same device
    count.  Requires a fixed ``batch_size`` (default 512) divisible by the
    device count; the module is exported for the current backend platform
    only.  Returns ``out_path``.
    """
    import jax
    from jax import export as jexport

    from ptbxl_tpu.models.params_io import load_checkpoint

    requested_platforms = tuple(platforms) if platforms is not None else None
    platforms = requested_platforms or ("cpu", "tpu")

    def _constrain_platforms(forced, why):
        """Engine/sharding constraints replace the platform list; an explicit
        user request that differs deserves a loud warning, not silence."""
        if requested_platforms is not None and requested_platforms != tuple(forced):
            import warnings

            warnings.warn(
                f"platforms={list(requested_platforms)} overridden to "
                f"{list(forced)}: {why}",
                stacklevel=3,
            )
        return tuple(forced)

    variables, classes = load_checkpoint(ckpt_path, arch=arch)
    disabled_checks = []
    if precision == "int8" and (with_cam or engine == "pallas"):
        raise ValueError(
            "precision='int8' supports only the plain XLA probs forward "
            "(CAM needs the differentiable model; Mosaic does not engage "
            "int8 MXU modes — docs/ARCHITECTURE.md)"
        )
    if engine == "pallas":
        if with_cam:
            raise ValueError("engine='pallas' does not support with_cam")
        from ptbxl_tpu.ops.pallas.fused_ecgcnn import (
            fold_bn_into_conv,
            fold_multimodal,
            fused_ecgcnn_probs,
            fused_multimodal_probs,
        )

        folded = (fold_multimodal if arch == "multimodal" else fold_bn_into_conv)(
            variables
        )
        if arch == "multimodal":

            def forward(x, d):
                return fused_multimodal_probs(x, d, folded, normalize=normalize)

        else:

            def forward(x):
                return fused_ecgcnn_probs(x, folded, normalize=normalize)

        platforms = _constrain_platforms(
            ("tpu",), "engine='pallas' is a Mosaic custom call (tpu-only)"
        )
        batch_size = batch_size or 8
        disabled_checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    elif with_cam:
        forward = _build_cam_forward(
            variables, arch, num_labels, feat_dim, demo_hidden_dim, normalize,
            n_samples, precision,
        )
    else:
        forward = _build_forward(
            variables, arch, num_labels, feat_dim, demo_hidden_dim, normalize,
            precision, int8_layers=int8_layers, calib_signals=calib_signals,
            qparams=qparams,
        )

    n_devices = 1
    sharding = None
    jit_fn = jax.jit(forward)
    if data_parallel:
        if engine == "pallas":
            raise ValueError("data_parallel does not combine with engine='pallas'")
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devices = jax.devices()
        n_devices = len(devices)
        batch_size = batch_size or 512
        if batch_size % n_devices:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {n_devices} devices"
            )
        mesh = Mesh(np.array(devices), ("data",))
        sharding = NamedSharding(mesh, PartitionSpec("data"))
        n_in = 2 if arch == "multimodal" else 1
        jit_fn = jax.jit(forward, in_shardings=(sharding,) * n_in,
                         out_shardings=sharding)
        # a sharded module is lowered for the exporting backend only
        platforms = _constrain_platforms(
            (jax.default_backend(),),
            "data_parallel artifacts lower for the exporting backend only",
        )

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    x_spec = jax.ShapeDtypeStruct((b, n_samples, n_leads), np.float32,
                                  sharding=sharding)
    export_fn = jexport.export(
        jit_fn, platforms=tuple(platforms), disabled_checks=disabled_checks
    )
    from ptbxl_tpu.ops.relu_pool import force_xla_pool_bwd

    # trace under the plain XLA pool composite: the Pallas pool backward
    # (ops/relu_pool.py) is a tpu-only custom call and must not leak into
    # multi-platform artifacts (reachable via the with_cam vjp)
    with force_xla_pool_bwd():
        if arch == "multimodal":
            d_spec = jax.ShapeDtypeStruct((b, 5), np.float32, sharding=sharding)
            exported = export_fn(x_spec, d_spec)
        else:
            exported = export_fn(x_spec)
    blob = exported.serialize()

    meta = {
        "arch": arch,
        "classes": list(classes) if classes is not None else None,
        "num_labels": num_labels,
        "n_samples": n_samples,
        "n_leads": n_leads,
        "normalize": normalize,
        "precision": precision,
        "int8_layers": [int(i) for i in getattr(forward, "int8_layers", ())]
        if precision == "int8" else None,
        "platforms": list(platforms),
        "with_cam": with_cam,
        "engine": engine,
        "batch_size": batch_size,
        "data_parallel": data_parallel,
        "n_devices": n_devices,
    }
    meta_bytes = json.dumps(meta).encode()
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    os.replace(tmp, out_path)  # atomic: no truncated artifacts on crash
    return out_path


def _read_artifact(path: str, meta_only: bool = False):
    """Parse an artifact file -> (meta dict, StableHLO blob or None)."""
    with open(path, "rb") as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f"{path} is not a ptbxl_tpu serving artifact")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode())
        blob = None if meta_only else f.read()
    return meta, blob


class ServingModel:
    """Load and run a serving artifact — no model code, no checkpoint needed.

    Accepts reference-layout ``[N, 12, T]`` or channels-last ``[N, T, 12]``
    raw signals like the Predictor; the exported module already contains the
    per-lead z-score when the artifact was built with ``normalize=True``.
    """

    def __init__(self, path: str):
        self.meta, blob = _read_artifact(path)

        from jax import export as jexport

        self._exported = jexport.deserialize(bytearray(blob))
        self.classes: Optional[List[str]] = self.meta["classes"]
        self.arch: str = self.meta["arch"]
        self.n_samples: int = self.meta["n_samples"]
        self.n_leads: int = self.meta["n_leads"]
        self.with_cam: bool = bool(self.meta.get("with_cam", False))
        self.batch_size: Optional[int] = self.meta.get("batch_size")  # None = symbolic
        self._sharding = None
        if self.meta.get("data_parallel"):
            import jax
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            n = int(self.meta["n_devices"])
            devices = jax.devices()
            if len(devices) < n:
                raise ValueError(
                    f"artifact was exported for {n} devices; only "
                    f"{len(devices)} visible"
                )
            mesh = Mesh(np.array(devices[:n]), ("data",))
            self._sharding = NamedSharding(mesh, PartitionSpec("data"))

    def _canon(self, signals: np.ndarray) -> np.ndarray:
        x = np.asarray(signals, dtype=np.float32)
        if x.ndim == 2:
            x = x[None]
        if x.shape[1] == self.n_leads and x.shape[2] != self.n_leads:
            x = x.transpose(0, 2, 1)
        if x.shape[1:] != (self.n_samples, self.n_leads):
            raise ValueError(
                f"expected [N, {self.n_samples}, {self.n_leads}] (or the "
                f"lead-major transpose), got {x.shape}"
            )
        return x

    def _call_exact(self, x: np.ndarray, d: Optional[np.ndarray]):
        if self._sharding is not None:
            import jax

            x = jax.device_put(x, self._sharding)
            if d is not None:
                d = jax.device_put(d, self._sharding)
        if self.arch == "multimodal":
            return self._exported.call(x, d)
        return self._exported.call(x)

    def __call__(self, signals: np.ndarray, demo: Optional[np.ndarray] = None):
        """probs [N, L] — or ``(probs [N, L], cams [N, L, T])`` for a
        ``with_cam`` artifact."""
        x = self._canon(signals)
        d = None
        if self.arch == "multimodal":
            if demo is None:
                raise ValueError("multimodal artifact requires demo vectors")
            d = np.asarray(demo, dtype=np.float32)
            if d.ndim == 1:
                d = d[None]
            if d.shape != (x.shape[0], 5):
                raise ValueError(
                    f"demo must be [N, 5] matching signals N={x.shape[0]}; "
                    f"got {d.shape}"
                )

        n_cls = len(self.classes) if self.classes else self.meta["num_labels"]
        if x.shape[0] == 0:  # symbolic shapes imply b >= 1; short-circuit N=0
            probs0 = np.empty((0, n_cls), np.float32)
            if self.with_cam:
                return probs0, np.empty((0, n_cls, self.n_samples), np.float32)
            return probs0

        if self.batch_size is None:  # symbolic batch: one call, any N
            out = self._call_exact(x, d)
            if self.with_cam:
                return np.asarray(out[0]), np.asarray(out[1])
            return np.asarray(out)

        # fixed-batch artifact (pallas engine / data_parallel): chunk + pad
        bs = self.batch_size
        probs_out, cams_out = [], []
        for i0 in range(0, x.shape[0], bs):
            cx = x[i0 : i0 + bs]
            cd = d[i0 : i0 + bs] if d is not None else None
            real = cx.shape[0]
            if real < bs:
                cx = np.concatenate([cx, np.repeat(cx[-1:], bs - real, axis=0)])
                if cd is not None:
                    cd = np.concatenate([cd, np.repeat(cd[-1:], bs - real, axis=0)])
            out = self._call_exact(cx, cd)
            if self.with_cam:
                probs_out.append(np.asarray(out[0])[:real])
                cams_out.append(np.asarray(out[1])[:real])
            else:
                probs_out.append(np.asarray(out)[:real])
        probs = np.concatenate(probs_out, axis=0)
        if self.with_cam:
            return probs, np.concatenate(cams_out, axis=0)
        return probs


def load_serving_artifact(path: str) -> ServingModel:
    return ServingModel(path)


def _main(argv: Optional[Sequence[str]] = None) -> int:
    """CLI: ``python -m ptbxl_tpu.serving export|info ...``."""
    import argparse

    from ptbxl_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor PTBXL_TPU_PLATFORM like every other CLI

    parser = argparse.ArgumentParser(prog="python -m ptbxl_tpu.serving")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="export a checkpoint to a serving artifact")
    pe.add_argument("ckpt")
    pe.add_argument("out")
    pe.add_argument("--arch", default="ecgcnn", choices=["ecgcnn", "multimodal"])
    pe.add_argument("--num_labels", type=int, default=5)
    pe.add_argument("--engine", default="xla", choices=["xla", "pallas"])
    pe.add_argument("--precision", default="highest",
                    choices=["highest", "default", "int8"])
    pe.add_argument("--batch_size", type=int, default=None)
    pe.add_argument("--with_cam", action="store_true")
    pe.add_argument("--data_parallel", action="store_true")
    pe.add_argument("--int8_layers", default=None,
                    help="comma-separated conv layer indices to quantize "
                         "(precision=int8; default: the measured winner)")
    pe.add_argument("--qparams", default=None,
                    help="save_qparams() .npz path — skip fold+calibrate "
                         "(precision=int8)")
    pe.add_argument("--no_normalize", action="store_true")
    pe.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms "
                         "(default cpu,tpu; engine/data_parallel may constrain)")

    pi = sub.add_parser("info", help="print an artifact's embedded contract")
    pi.add_argument("artifact")

    args = parser.parse_args(argv)
    if args.cmd == "export":
        out = export_serving_artifact(
            args.ckpt, args.out, arch=args.arch, num_labels=args.num_labels,
            normalize=not args.no_normalize, precision=args.precision,
            platforms=(tuple(p.strip() for p in args.platforms.split(",") if p.strip())
                       if args.platforms else None),
            with_cam=args.with_cam,
            engine=args.engine, batch_size=args.batch_size,
            data_parallel=args.data_parallel,
            int8_layers=(tuple(int(i) for i in args.int8_layers.split(","))
                         if args.int8_layers else None),
            qparams=args.qparams,
        )
        print(f"[SAVE] serving artifact: {out}")
    else:
        meta, _ = _read_artifact(args.artifact, meta_only=True)
        try:
            print(json.dumps(meta, indent=2))
        except BrokenPipeError:  # e.g. piped into `head`
            os.dup2(os.open(os.devnull, os.O_WRONLY), 1)
    return 0


if __name__ == "__main__":  # pragma: no cover - thin CLI shim
    raise SystemExit(_main())
