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
    not os.path.exists(BASELINE_CKPT), reason="bundled checkpoints missing"
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
