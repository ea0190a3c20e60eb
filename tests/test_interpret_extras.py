"""Batched Grad-CAM, plotting helpers, and profiling utilities."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.interpret.grad_cam import GradCAM, batch_grad_cam, linear_interpolate_1d  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402


def test_linear_interpolation_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for l_in, l_out in [(312, 5000), (625, 5000), (10, 37), (100, 100)]:
        x = rng.standard_normal(l_in).astype(np.float32)
        got = np.asarray(linear_interpolate_1d(jnp.asarray(x)[None], l_out))[0]
        want = F.interpolate(
            torch.from_numpy(x)[None, None], size=l_out,
            mode="linear", align_corners=False,
        )[0, 0].numpy()
        # torch's vectorized CPU kernel computes weights in a slightly
        # different order; 1e-4 absolute is far below the CAM artifact
        # tolerance (golden tests pin the end-to-end result at 2e-3)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_batch_grad_cam_multiple_classes(rng):
    model, variables = build_ecgcnn(num_labels=5, seed=0)
    x = jnp.asarray(rng.standard_normal((3, 256, 12)).astype(np.float32))
    cam_fn = GradCAM(model, variables, signal_length=256)
    probs, cams = batch_grad_cam(cam_fn, x, class_indices=[0, 2, 4])
    assert probs.shape == (3, 5)
    assert cams.shape == (3, 3, 256)
    # each class's cam equals the single-class call (one-forward path must
    # be numerically identical to the per-class vjp)
    for slot, ci in enumerate([0, 2, 4]):
        _, cam_i = cam_fn(x, class_idx=ci)
        np.testing.assert_allclose(np.asarray(cams[slot]), np.asarray(cam_i), atol=1e-6)
    probs_i, _ = cam_fn(x, class_idx=0)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_i), atol=1e-6)


def test_batch_grad_cam_multimodal(rng):
    from ptbxl_tpu.models.factory import build_multimodal

    model, variables = build_multimodal(num_labels=5, seed=0)
    x = jnp.asarray(rng.standard_normal((2, 256, 12)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    cam_fn = GradCAM(model, variables, signal_length=256, multimodal=True, eps=1e-8)
    probs, cams = batch_grad_cam(cam_fn, x, class_indices=[1, 3], x_demo=d)
    assert cams.shape == (2, 2, 256)
    for slot, ci in enumerate([1, 3]):
        _, cam_i = cam_fn(x, class_idx=ci, x_demo=d)
        np.testing.assert_allclose(np.asarray(cams[slot]), np.asarray(cam_i), atol=1e-6)


def test_plotting_writes_pngs(tmp_path, rng):
    from ptbxl_tpu.interpret.plotting import (
        plot_ecg_and_demo_importance,
        plot_ecg_with_cam,
    )

    ecg = rng.standard_normal((12, 200)).astype(np.float32)
    cam = rng.uniform(size=200).astype(np.float32)
    p1 = str(tmp_path / "a.png")
    plot_ecg_with_cam(ecg, cam, 0, "t", p1)
    assert os.path.getsize(p1) > 1000

    p2 = str(tmp_path / "b.png")
    plot_ecg_with_cam(ecg, cam, 0, "t", p2, guard_norm=True, threshold=0.2)
    assert os.path.getsize(p2) > 1000

    p3 = str(tmp_path / "c.png")
    plot_ecg_and_demo_importance(
        ecg, cam, np.array([0.1, 1.0, 0.3, 0.0, 0.0]),
        ["age", "sex", "height", "weight", "pacemaker"], 0, "t", p3,
    )
    assert os.path.getsize(p3) > 1000


def test_step_timer():
    from ptbxl_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.start()
    t.stop(100)
    t.start()
    t.stop(50)
    assert t.records == 150
    assert t.records_per_sec > 0
    assert "150 records" in t.report("train")


def test_trace_noop_without_dir():
    from ptbxl_tpu.utils.profiling import trace

    with trace(None):
        pass  # must not require a profiler session


def test_profiler_trace_writes_artifacts(tmp_path, monkeypatch):
    """PTBXL_TPU_TRACE=<dir> produces a loadable jax.profiler trace."""
    import glob as _glob

    import jax.numpy as jnp

    from ptbxl_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    monkeypatch.setenv("PTBXL_TPU_TRACE", d)
    with trace():
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
    files = _glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz") for f in files), files
