"""Serving artifact (jax.export / StableHLO) round-trip tests.

Exports the bundled converted reference checkpoints, reloads the artifact,
and checks probabilities against the Predictor's XLA parity path on the demo
pack — the whole point of the artifact is serving without model code.
"""

import glob
import os

import numpy as np
import pytest

from ptbxl_tpu.inference import Predictor
from ptbxl_tpu.serving import ServingModel, export_serving_artifact

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_CKPT = os.path.join(REPO, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
MM_CKPT = os.path.join(REPO, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz")
DEMO_DIR = os.path.join(REPO, "data/demo")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(BASELINE_CKPT) and os.path.exists(MM_CKPT)),
    reason="bundled checkpoints missing",
)


def _demo_batch(kind):
    files = sorted(glob.glob(os.path.join(DEMO_DIR, kind, "*.npz")))
    assert files, f"no demo pack under {DEMO_DIR}/{kind}"
    ecg = np.stack([np.load(f)["ecg"] for f in files])  # [N, 12, T]
    demo = None
    if kind == "multimodal":
        demo = np.stack([np.load(f)["demo"] for f in files])
    return ecg, demo


def test_baseline_artifact_roundtrip(tmp_path):
    path = str(tmp_path / "ecg_baseline.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",))
    model = ServingModel(path)
    assert model.classes == ["MI", "STTC", "HYP", "CD", "NORM"]

    ecg, _ = _demo_batch("single")
    got = model(ecg)

    ref = Predictor.from_checkpoint(BASELINE_CKPT, engine="xla")(ecg)
    np.testing.assert_allclose(got, ref, atol=2e-6)

    # symbolic batch: any batch size through the same artifact
    one = model(ecg[0])
    np.testing.assert_allclose(one[0], got[0], atol=2e-6)
    np.testing.assert_allclose(model(ecg[:3]), got[:3], atol=2e-6)


def test_multimodal_artifact_roundtrip(tmp_path):
    path = str(tmp_path / "ecg_multimodal.stablehlo")
    export_serving_artifact(MM_CKPT, path, arch="multimodal", platforms=("cpu",))
    model = ServingModel(path)

    ecg, demo = _demo_batch("multimodal")
    got = model(ecg, demo=demo)
    ref = Predictor.from_checkpoint(MM_CKPT, arch="multimodal", engine="xla")(ecg, demo=demo)
    np.testing.assert_allclose(got, ref, atol=2e-6)

    with pytest.raises(ValueError, match="demo"):
        model(ecg)


def test_artifact_layout_and_validation(tmp_path):
    path = str(tmp_path / "a.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",))
    model = ServingModel(path)
    ecg, _ = _demo_batch("single")
    # channels-last input accepted too
    np.testing.assert_allclose(
        model(ecg.transpose(0, 2, 1)), model(ecg), atol=0
    )
    with pytest.raises(ValueError, match="expected"):
        model(np.zeros((2, 999, 12), np.float32))

    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="artifact"):
        ServingModel(bad)


def test_cam_artifact(tmp_path):
    """with_cam artifact returns (probs, all-class CAMs) matching GradCAM."""
    import jax.numpy as jnp

    from ptbxl_tpu.interpret.grad_cam import GradCAM
    from ptbxl_tpu.models.ecg_cnn import ECGCNN
    from ptbxl_tpu.models.params_io import load_checkpoint
    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch

    path = str(tmp_path / "cam.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",), with_cam=True)
    model = ServingModel(path)
    assert model.with_cam

    ecg, _ = _demo_batch("single")
    probs, cams = model(ecg[:3])
    assert probs.shape == (3, 5) and cams.shape == (3, 5, 5000)
    assert np.isfinite(cams).all() and cams.min() >= 0.0 and cams.max() <= 1.0

    variables, _ = load_checkpoint(BASELINE_CKPT, arch="ecgcnn")
    gc = GradCAM(ECGCNN(feat_dim=256, num_labels=5), variables,
                 signal_length=5000, norm_first=False, eps=1e-9)
    x = zscore_per_lead_batch(jnp.asarray(ecg[:3].transpose(0, 2, 1)))
    ref_probs, ref_cams = gc.multi(x, np.arange(5))
    np.testing.assert_allclose(probs, np.asarray(ref_probs), atol=2e-6)
    np.testing.assert_allclose(cams, np.asarray(ref_cams).transpose(1, 0, 2), atol=2e-5)


def test_fixed_batch_artifact_chunks_and_pads(tmp_path):
    """batch_size pins the module's batch dim; ServingModel chunks + pads."""
    path = str(tmp_path / "fixed.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",), batch_size=4)
    model = ServingModel(path)
    assert model.batch_size == 4

    ecg, _ = _demo_batch("single")  # 7 records -> chunks of 4 + padded 3
    got = model(ecg)
    sym = str(tmp_path / "sym.stablehlo")
    export_serving_artifact(BASELINE_CKPT, sym, platforms=("cpu",))
    np.testing.assert_allclose(got, ServingModel(sym)(ecg), atol=2e-6)


def test_pallas_engine_rejects_with_cam(tmp_path):
    with pytest.raises(ValueError, match="pallas"):
        export_serving_artifact(BASELINE_CKPT, str(tmp_path / "x"),
                                engine="pallas", with_cam=True)


def test_data_parallel_artifact_8_devices(tmp_path):
    """DP artifact embeds the GSPMD sharding; serves on the same mesh size."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    path = str(tmp_path / "dp.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, data_parallel=True,
                            batch_size=8)
    model = ServingModel(path)
    assert model.meta["n_devices"] == len(jax.devices())
    assert model.batch_size == 8

    ecg, _ = _demo_batch("single")  # 7 -> padded to one 8-chunk
    got = model(ecg)
    ref = Predictor.from_checkpoint(BASELINE_CKPT, engine="xla")(ecg)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_data_parallel_rejects_indivisible_batch(tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    with pytest.raises(ValueError, match="divisible"):
        export_serving_artifact(BASELINE_CKPT, str(tmp_path / "x"),
                                data_parallel=True,
                                batch_size=len(jax.devices()) * 2 + 1)


def test_serving_cli_export_and_info(tmp_path, capsys):
    from ptbxl_tpu.serving import _main

    out = str(tmp_path / "cli.stablehlo")
    assert _main(["export", BASELINE_CKPT, out, "--platforms", "cpu",
                  "--batch_size", "4"]) == 0
    assert os.path.exists(out)
    assert _main(["info", out]) == 0
    captured = capsys.readouterr().out
    assert '"batch_size": 4' in captured and '"arch": "ecgcnn"' in captured

    ecg, _ = _demo_batch("single")
    probs = ServingModel(out)(ecg[:2])
    assert probs.shape == (2, 5)


def test_fixed_batch_with_cam_and_empty_input(tmp_path):
    """with_cam works with a fixed batch (chunk/pad keeps the tuple), and
    N=0 returns empty arrays on every path."""
    path = str(tmp_path / "camfixed.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",),
                            with_cam=True, batch_size=4)
    model = ServingModel(path)

    ecg, _ = _demo_batch("single")  # 7 records -> 4 + padded 3
    probs, cams = model(ecg)
    assert probs.shape == (7, 5) and cams.shape == (7, 5, 5000)

    sym = str(tmp_path / "camsym.stablehlo")
    export_serving_artifact(BASELINE_CKPT, sym, platforms=("cpu",), with_cam=True)
    ref_probs, ref_cams = ServingModel(sym)(ecg)
    np.testing.assert_allclose(probs, ref_probs, atol=2e-6)
    np.testing.assert_allclose(cams, ref_cams, atol=2e-5)

    empty = np.zeros((0, 12, 5000), np.float32)
    p0, c0 = model(empty)
    assert p0.shape == (0, 5) and c0.shape == (0, 5, 5000)
    p0s = ServingModel(sym)(empty)[0]
    assert p0s.shape == (0, 5)
    fixed_plain = str(tmp_path / "plainfixed.stablehlo")
    export_serving_artifact(BASELINE_CKPT, fixed_plain, platforms=("cpu",), batch_size=4)
    assert ServingModel(fixed_plain)(empty).shape == (0, 5)


def test_int8_artifact_roundtrip(tmp_path):
    """PTQ int8 artifact matches the int8 Predictor exactly and stays
    within the battery-gate bound of the f32 parity path (the default
    calibration is the robust preset since round 4: demo parity ~1.6e-2,
    battery max ~3e-2 — see ops/quant.py)."""
    path = str(tmp_path / "ecg_baseline_int8.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",),
                            precision="int8")
    model = ServingModel(path)
    assert model.meta["precision"] == "int8"

    ecg, _ = _demo_batch("single")
    got = model(ecg)
    ref_q = Predictor.from_checkpoint(BASELINE_CKPT, precision="int8")(ecg)
    np.testing.assert_allclose(got, ref_q, atol=2e-6)

    ref_f32 = Predictor.from_checkpoint(BASELINE_CKPT, engine="xla")(ecg)
    assert np.abs(got - ref_f32).max() < 4e-2


def test_int8_artifact_rejects_cam_and_pallas(tmp_path):
    with pytest.raises(ValueError, match="int8"):
        export_serving_artifact(BASELINE_CKPT, str(tmp_path / "x"),
                                precision="int8", with_cam=True)
    with pytest.raises(ValueError, match="int8"):
        export_serving_artifact(BASELINE_CKPT, str(tmp_path / "x"),
                                precision="int8", engine="pallas")


def test_data_parallel_int8_artifact(tmp_path):
    """Pod serving: GSPMD batch sharding + PTQ int8 in one artifact."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    path = str(tmp_path / "dp_int8.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, data_parallel=True,
                            batch_size=8, precision="int8")
    model = ServingModel(path)
    assert model.meta["precision"] == "int8"
    assert model.meta["n_devices"] == len(jax.devices())

    ecg, _ = _demo_batch("single")
    got = model(ecg)
    ref_q = Predictor.from_checkpoint(BASELINE_CKPT, precision="int8")(ecg)
    np.testing.assert_allclose(got, ref_q, atol=2e-6)


def test_int8_export_num_labels_mismatch_raises(tmp_path):
    af = os.path.join(REPO, "outputs/af_binary/ckpts/af_binary_best.npz")
    with pytest.raises(ValueError, match="labels"):
        export_serving_artifact(af, str(tmp_path / "x"), precision="int8")


def test_int8_export_with_qparams(tmp_path):
    """Offline qparams flow into the artifact (skips fold+calibrate)."""
    from ptbxl_tpu.models.params_io import load_npz
    from ptbxl_tpu.ops.quant import quantize_model, save_qparams

    variables, _ = load_npz(BASELINE_CKPT)
    qp = str(tmp_path / "q.npz")
    save_qparams(quantize_model(variables, arch="ecgcnn"), qp)

    path = str(tmp_path / "int8_from_qparams.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",),
                            precision="int8", qparams=qp)
    ecg, _ = _demo_batch("single")
    got = ServingModel(path)(ecg)
    ref_q = Predictor.from_checkpoint(BASELINE_CKPT, precision="int8")(ecg)
    np.testing.assert_allclose(got, ref_q, atol=2e-6)


def test_artifact_rejects_garbage_and_truncation(tmp_path):
    """Loading must fail loudly on non-artifacts and truncated artifacts."""
    bad = tmp_path / "bad.stablehlo"
    bad.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="not a ptbxl_tpu serving artifact"):
        ServingModel(str(bad))

    good = str(tmp_path / "good.stablehlo")
    export_serving_artifact(BASELINE_CKPT, good, platforms=("cpu",))
    blob = open(good, "rb").read()
    trunc = tmp_path / "trunc.stablehlo"
    trunc.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(Exception):  # clean error from deserialize, no crash
        ServingModel(str(trunc))


def test_int8_meta_records_layer_set(tmp_path):
    from ptbxl_tpu.ops.quant import default_int8_layers

    path = str(tmp_path / "i8.stablehlo")
    export_serving_artifact(BASELINE_CKPT, path, platforms=("cpu",),
                            precision="int8")
    m = ServingModel(path)
    assert tuple(m.meta["int8_layers"]) == default_int8_layers("ecgcnn")


def test_explicit_platforms_override_warns(tmp_path):
    """Explicit --platforms replaced by an engine/sharding constraint must
    warn, not silently drop the request (data_parallel lowers for the
    exporting backend only)."""
    import warnings

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    path = str(tmp_path / "dp_warn.stablehlo")
    with pytest.warns(UserWarning, match="overridden"):
        export_serving_artifact(BASELINE_CKPT, path, data_parallel=True,
                                batch_size=8, platforms=("cpu", "tpu"))
    # the default (platforms=None) stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        export_serving_artifact(BASELINE_CKPT, path, data_parallel=True,
                                batch_size=8)
