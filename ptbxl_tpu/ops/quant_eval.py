"""Distributional accuracy battery for the PTQ int8 path (ops/quant.py).

Round-2 verdict: the int8 accuracy gate rested on the 7 demo-pack samples.
This module replaces that with a deterministic battery of >=512 synthetic
12-lead ECGs sweeping amplitude, noise level, morphology (beat rate/width,
ST-like deflections, high-frequency ripple), plus degenerate edge cases
(flatline leads, spike artifacts, strong baseline drift) — and reports error
QUANTILES and the decision-flip rate at the reference's 0.5 threshold
(reference threshold semantics: scripts/06_ecg_baseline_test.py:32), not just
a 7-sample max.

The battery is synthetic by necessity (PTB-XL is not bundled) but spans a
wider input range than the demo pack; the demo pack is always appended so the
old oracle remains a subset.  Consumed by bench.py's int8 gate and
tools/tune_int8.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np


def make_battery(n: int = 512, T: int = 5000, fs: float = 500.0,
                 seed: int = 1234, include_demo_pack: bool = True) -> np.ndarray:
    """Deterministic battery of varied raw ECG-like signals ``[N, 12, T]``.

    Sweeps (cycled across records so every combination appears):
      * global amplitude x0.1 .. x10 (gain/electrode variation)
      * additive noise sigma 0.05 .. 1.0
      * beat rate 0.7 .. 3.5 Hz and beat width (sharp .. wide)
      * ST-deflection and ripple components on/off with varying strength
      * every 16th record: one flatlined lead; every 23rd: spike artifacts;
        every 31st: heavy baseline wander
    """
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fs
    amps = np.geomspace(0.1, 10.0, 8)
    noises = np.geomspace(0.05, 1.0, 6)
    out = np.empty((n, 12, T), np.float32)
    for i in range(n):
        amp = amps[i % len(amps)]
        noise = noises[(i // len(amps)) % len(noises)]
        hr = rng.uniform(0.7, 3.5)
        width = rng.uniform(3.0, 9.0)
        phase = rng.uniform(0, 2 * np.pi)
        carrier = np.sin(2 * np.pi * hr * t + phase)
        beat = np.sign(carrier) * np.abs(carrier) ** width
        env = np.abs(carrier) ** 6
        x = beat
        if i % 3 == 0:  # ST-like deflection
            x = x - rng.uniform(0.2, 0.6) * np.roll(env, int(0.15 * fs))
        if i % 4 == 0:  # beat-gated ripple
            x = x + rng.uniform(0.1, 0.5) * env * np.sin(2 * np.pi * 9.0 * t)
        rec = np.empty((12, T), np.float32)
        for lead in range(12):
            g = rng.uniform(0.5, 1.5)
            rec[lead] = amp * (g * x + noise * rng.standard_normal(T))
        if i % 16 == 5:
            rec[rng.integers(0, 12)] = 0.0  # flatline lead
        if i % 23 == 7:  # electrode spike artifacts
            for _ in range(rng.integers(1, 5)):
                p = rng.integers(0, T)
                rec[:, p : p + 3] += amp * rng.uniform(5, 20)
        if i % 31 == 11:  # heavy baseline wander
            rec += amp * 2.0 * np.sin(2 * np.pi * 0.15 * t + rng.uniform(0, 6))[None, :]
        out[i] = rec

    if include_demo_pack:
        try:
            from ptbxl_tpu.ops.quant import demo_pack_signals

            demo = demo_pack_signals()  # [7, T, 12]
            if demo.shape[1] == T:
                out = np.concatenate([out, demo.transpose(0, 2, 1)], axis=0)
        except (FileNotFoundError, OSError):
            pass
    return out


def battery_artifact_mask(n: int = 512, include_demo_pack: bool = True,
                          total: Optional[int] = None) -> np.ndarray:
    """Boolean mask over make_battery(n) rows marking the artifact records
    (flatline/spike/wander cases).  Demo-pack rows (appended last) are not
    artifacts."""
    m = np.zeros(total if total is not None else n, bool)
    for i in range(n):
        if i % 16 == 5 or i % 23 == 7 or i % 31 == 11:
            m[i] = True
    return m


def robust_calibration_signals(n: int = 64, T: int = 5000,
                               seed: int = 999) -> np.ndarray:
    """Diverse synthetic calibration set for out-of-distribution robustness.

    Measured tradeoff (v5e/CPU identical numerics, 103-record battery,
    ecgcnn layers (1,3)): with the default demo-pack calibration the
    in-distribution error is max 3.7e-3 but unusual inputs (fast rhythms,
    heavy noise, electrode artifacts) clip the calibrated activation range
    and reach max|dprob| ~0.15 with decision flips; calibrating on this set
    instead bounds the WHOLE battery at max ~0.022 / zero flips, at the cost
    of in-distribution error rising to ~0.016 (coarser quantization steps).
    Since round 4 this preset IS the shipping default
    (ops/quant.default_calib_signals); demo-pack calibration remains
    available for strictly PTB-XL-like traffic via
    ``calib_signals=demo_pack_signals()``.  (Full table:
    docs/ARCHITECTURE.md "int8 accuracy".)
    """
    return make_battery(n=n, T=T, seed=seed, include_demo_pack=True)


def battery_demo_vectors(n: int, seed: int = 1234) -> np.ndarray:
    """Plausible demographic vectors [n, 5] for the multimodal battery
    (age/100, sex 0/0.5/1, height/250, weight/200, pacemaker always 0.0 —
    the demo-vector quirk ledger, data/demo_vector.py)."""
    rng = np.random.default_rng(seed + 77)
    age = rng.uniform(0.18, 0.95, n)
    sex = rng.choice([0.0, 0.5, 1.0], n, p=[0.48, 0.04, 0.48])
    height = rng.uniform(0.55, 0.82, n)
    weight = rng.uniform(0.2, 0.75, n)
    return np.stack([age, sex, height, weight, np.zeros(n)], 1).astype(np.float32)


def quant_accuracy_report(
    variables: Dict[str, Any],
    arch: str = "ecgcnn",
    int8_layers: Optional[Sequence[int]] = None,
    signals: Optional[np.ndarray] = None,
    num_labels: int = 5,
    batch: int = 128,
    threshold: float = 0.5,
    calib_signals: Optional[np.ndarray] = None,
    bias_correct: bool = False,
    q: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Quantized-vs-f32 probability error distribution on the battery.

    Returns ``{n, max, p99, p50, mean, flip_rate, flips, int8_layers}`` where
    errors are per-(sample, class) |dprob| against the f32 'highest' parity
    path, and ``flip_rate`` is the fraction of (sample, class) decisions at
    ``threshold`` that disagree.  Pass a prebuilt ``q`` (quantize_model
    result) to skip re-quantization.
    """
    import jax
    import jax.numpy as jnp

    from ptbxl_tpu.models.ecg_cnn import ECGCNN
    from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal
    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch
    from ptbxl_tpu.ops.quant import (
        default_int8_layers,
        make_quantized_forward,
        quantize_model,
        split_meta,
    )

    if int8_layers is None:
        int8_layers = default_int8_layers(arch)
    default_battery = signals is None
    if default_battery:
        signals = make_battery()
    x = np.asarray(signals, np.float32)
    if x.shape[1] != 12 and x.shape[2] == 12:
        x = x.transpose(0, 2, 1)  # -> [N, 12, T]
    n = len(x)

    if q is None:
        q = quantize_model(variables, arch=arch, int8_layers=int8_layers,
                           calib_signals=calib_signals, bias_correct=bias_correct)
    arrs, n_blocks, layers = split_meta(q)
    qf = jax.jit(make_quantized_forward(n_blocks, layers, arch=arch))

    if arch == "multimodal":
        model = ECGMultimodal(feat_dim=256, num_labels=num_labels,
                              precision="highest")
        demo = battery_demo_vectors(n)

        @jax.jit
        def f32f(v, xb, db):
            h = zscore_per_lead_batch(xb)
            return jax.nn.sigmoid(model.apply(v, h, db, False))

    else:
        model = ECGCNN(feat_dim=256, num_labels=num_labels, precision="highest")
        demo = None

        @jax.jit
        def f32f(v, xb):
            h = zscore_per_lead_batch(xb)
            return jax.nn.sigmoid(model.apply(v, h, False))

    errs = []
    flips = 0
    flip_margin = 0.0  # worst |p_ref - threshold| among flipped decisions
    for s in range(0, n, batch):
        xb = jnp.asarray(x[s:s + batch].transpose(0, 2, 1))  # [b, T, 12]
        if arch == "multimodal":
            db = jnp.asarray(demo[s:s + batch])
            p_ref = np.asarray(f32f(variables, xb, db), np.float32)
            p_q = np.asarray(qf(arrs, xb, db), np.float32)
        else:
            p_ref = np.asarray(f32f(variables, xb), np.float32)
            p_q = np.asarray(qf(arrs, xb), np.float32)
        errs.append(np.abs(p_q - p_ref).reshape(-1))
        fl = (p_q >= threshold) != (p_ref >= threshold)
        flips += int(fl.sum())
        if fl.any():
            flip_margin = max(flip_margin, float(np.abs(p_ref[fl] - threshold).max()))

    e = np.concatenate(errs)
    report = {
        "n": n,
        "num_decisions": int(e.size),
        "int8_layers": tuple(int(i) for i in layers),
        "bias_correct": bool(bias_correct),
        "max": float(e.max()),
        "p99": float(np.percentile(e, 99)),
        "p50": float(np.percentile(e, 50)),
        "mean": float(e.mean()),
        "flips": int(flips),
        "flip_rate": float(flips / e.size),
        # a decision can only flip when the f32 prob sits within max-err of
        # the threshold; this records how deep into the confident zone any
        # flip reached (bounded by `max` by construction)
        "flip_margin": float(flip_margin),
    }
    if default_battery:  # default battery: attach the subset breakdown
        per_rec = e.reshape(n, -1).max(axis=1)
        art = battery_artifact_mask(512, total=n)
        demo_rows = np.zeros(n, bool)
        demo_rows[512:] = True  # demo pack appended after the synthetic 512
        plain = ~art & ~demo_rows
        report["subsets"] = {
            "plain": {"n": int(plain.sum()), "max": float(per_rec[plain].max())},
            "artifact": {"n": int(art.sum()), "max": float(per_rec[art].max())},
            "demo": {"n": int(demo_rows.sum()),
                     "max": float(per_rec[demo_rows].max()) if demo_rows.any() else None},
        }
    return report


# Robust-preset gate: with robust_calibration_signals(), the full 519-signal
# battery on the real chip measured max 3.0e-2 / p99 2.0e-2 / flip_rate
# 3.5e-3 (9 of 2595 decisions, all within max-err of the 0.5 threshold —
# `flip_margin` <= `max` by construction, i.e. only already-uncertain
# decisions move) on the ecgcnn (1,3) default; the gate sits just above
# with margin.  The demo-calibrated default is gated separately (bench.py
# demo 5e-3 max) because its battery tail is unbounded by design — see
# robust_calibration_signals' docstring for the tradeoff.
BATTERY_GATE = {"max": 4e-2, "p99": 3e-2, "flip_rate": 6e-3}


def passes_battery_gate(report: Dict[str, Any],
                        gate: Optional[Dict[str, float]] = None) -> bool:
    g = dict(BATTERY_GATE, **(gate or {}))
    return (report["max"] <= g["max"] and report["p99"] <= g["p99"]
            and report["flip_rate"] <= g["flip_rate"])
