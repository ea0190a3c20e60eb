"""int8 distributional accuracy battery (ops/quant_eval.py).

Round-2 verdict item 3: the int8 gate rested on 7 demo samples.  These tests
pin the battery generator's determinism, the report schema, the
bias-correction hook, and — slow-marked — the robust-calibration preset's
battery gate on a reduced battery.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import os  # noqa: E402

from ptbxl_tpu.models.params_io import load_checkpoint  # noqa: E402
from ptbxl_tpu.ops.quant import quantize_model  # noqa: E402
from ptbxl_tpu.ops.quant_eval import (  # noqa: E402
    BATTERY_GATE,
    battery_artifact_mask,
    make_battery,
    passes_battery_gate,
    quant_accuracy_report,
    robust_calibration_signals,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(HERE, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")


def test_battery_deterministic_and_varied():
    a = make_battery(n=32, T=1024, include_demo_pack=False)
    b = make_battery(n=32, T=1024, include_demo_pack=False)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 12, 1024) and a.dtype == np.float32
    # amplitude sweep spans orders of magnitude
    scales = np.abs(a).max(axis=(1, 2))
    assert scales.max() / scales.min() > 20
    # artifact records exist and are flagged
    mask = battery_artifact_mask(32, total=32)
    assert mask.any() and not mask.all()


def test_battery_includes_demo_pack_at_full_length():
    bat = make_battery(n=8, T=5000)
    assert len(bat) == 8 + 7  # 7 demo-pack records appended
    short = make_battery(n=8, T=1024)  # length mismatch -> no demo append
    assert len(short) == 8


def test_report_schema_and_bias_correct(rng):
    variables, _ = load_checkpoint(CKPT, arch="ecgcnn")
    sig = make_battery(n=6, T=5000, include_demo_pack=False)
    rep = quant_accuracy_report(variables, "ecgcnn", signals=sig, batch=6)
    for k in ("n", "max", "p99", "p50", "mean", "flips", "flip_rate",
              "int8_layers", "num_decisions"):
        assert k in rep
    assert rep["n"] == 6 and rep["num_decisions"] == 30
    assert 0.0 <= rep["p50"] <= rep["p99"] <= rep["max"]

    # bias correction shifts the quantized conv biases (and only them)
    q0 = quantize_model(variables, "ecgcnn", calib_signals=sig[:2])
    q1 = quantize_model(variables, "ecgcnn", calib_signals=sig[:2],
                        bias_correct=True)
    for i in q0["int8_layers"]:
        assert not np.allclose(np.asarray(q0[f"b{i}"]), np.asarray(q1[f"b{i}"]))
        np.testing.assert_array_equal(np.asarray(q0[f"w{i}"]),
                                      np.asarray(q1[f"w{i}"]))


@pytest.mark.slow
def test_default_calibration_passes_battery_gate():
    """Round-4 flip: the DEFAULT calibration is the robust preset and must
    pass the battery gate (the round-3 verdict's item 2); the old demo-pack
    calibration does NOT — that contrast is the documented tradeoff, so
    assert both directions."""
    from ptbxl_tpu.ops.quant import demo_pack_signals

    variables, _ = load_checkpoint(CKPT, arch="ecgcnn")
    bat = make_battery(n=64)  # reduced battery: same generator, CI-sized
    default = quant_accuracy_report(variables, "ecgcnn", signals=bat)
    assert passes_battery_gate(default), default

    demo = quant_accuracy_report(variables, "ecgcnn", signals=bat,
                                 calib_signals=demo_pack_signals())
    assert demo["max"] > BATTERY_GATE["max"], (
        "demo calibration unexpectedly passes the battery gate — "
        "update the documented tradeoff"
    )


def test_default_calib_is_robust_preset():
    """ops/quant.default_calib_signals must BE the robust preset (the
    shipped Predictor / serving-export / tune_int8 default all route
    through it), in the documented [N, T, 12] layout."""
    from ptbxl_tpu.ops.quant import default_calib_signals

    d = default_calib_signals()
    assert d.shape[1:] == (5000, 12)
    np.testing.assert_array_equal(
        d, robust_calibration_signals().transpose(0, 2, 1))
