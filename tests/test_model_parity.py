"""Golden parity: JAX models + vjp Grad-CAM vs. the torch reference outputs.

Goldens in tests/golden/ were produced by tools/make_goldens.py from the
reference's released checkpoints on its demo pack (the reference's de-facto
fixtures, SURVEY.md §4).  Tolerances: probabilities <= 2e-5 absolute, CAMs
<= 2e-3 absolute (CAMs amplify conv rounding via min-max normalization).
"""

import glob
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.interpret.grad_cam import GradCAM, demo_importance  # noqa: E402
from ptbxl_tpu.models import ECGCNN, ECGMultimodal  # noqa: E402
from ptbxl_tpu.models.params_io import load_npz  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(HERE, "tests", "golden")
DEMO = os.path.join(HERE, "data", "demo")

PROB_TOL = 2e-5
CAM_TOL = 2e-3


def _load_samples(sub):
    files = sorted(glob.glob(os.path.join(DEMO, sub, "*.npz")))
    assert len(files) == 7
    return files


@pytest.fixture(scope="module")
def baseline():
    variables, classes = load_npz(os.path.join(HERE, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz"))
    assert classes == ["MI", "STTC", "HYP", "CD", "NORM"]
    return ECGCNN(feat_dim=256, num_labels=5), variables


@pytest.fixture(scope="module")
def multimodal():
    variables, _ = load_npz(os.path.join(HERE, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz"))
    return ECGMultimodal(num_labels=5), variables


@pytest.fixture(scope="module")
def af_model():
    variables, classes = load_npz(os.path.join(HERE, "outputs/af_binary/ckpts/af_binary_best.npz"))
    assert classes is None  # AF checkpoint carries no classes (reference: scripts/05:158)
    return ECGCNN(feat_dim=256, num_labels=1), variables


def test_param_counts(baseline, multimodal, af_model):
    # reference §2.2: 719,397 / 757,221 / 718,369
    def count(v):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v["params"]))

    assert count(baseline[1]) == 719_397
    assert count(multimodal[1]) == 757_221
    assert count(af_model[1]) == 718_369


def test_baseline_probs_and_cam(baseline):
    model, variables = baseline
    g = np.load(os.path.join(GOLD, "golden_baseline.npz"))
    cam_fn = GradCAM(model, variables, signal_length=5000, norm_first=False, eps=1e-9)
    cam_lib_fn = GradCAM(model, variables, signal_length=5000, norm_first=True)

    for i, f in enumerate(_load_samples("single")):
        z = np.load(f, allow_pickle=True)
        x = jnp.asarray(z["ecg"].T[None])
        probs, cam = cam_fn(x, class_idx=0)
        np.testing.assert_allclose(np.asarray(probs)[0], g["probs"][i], atol=PROB_TOL)
        np.testing.assert_allclose(np.asarray(cam)[0], g["cam_demo"][i], atol=CAM_TOL)
        _, cam_lib = cam_lib_fn(x, class_idx=0)
        np.testing.assert_allclose(np.asarray(cam_lib)[0], g["cam_library"][i], atol=CAM_TOL)


def test_multimodal_probs_cam_importance(multimodal):
    model, variables = multimodal
    g = np.load(os.path.join(GOLD, "golden_multimodal.npz"))
    cam_fn = GradCAM(model, variables, signal_length=5000, norm_first=False, eps=1e-8, multimodal=True)

    for i, f in enumerate(_load_samples("multimodal")):
        z = np.load(f, allow_pickle=True)
        x = jnp.asarray(z["ecg"].T[None])
        d = jnp.asarray(z["demo"][None])
        probs, cam = cam_fn(x, class_idx=0, x_demo=d)
        np.testing.assert_allclose(np.asarray(probs)[0], g["probs"][i], atol=PROB_TOL)
        np.testing.assert_allclose(np.asarray(cam)[0], g["cam"][i], atol=CAM_TOL)
        imp = demo_importance(model, variables, x, d, class_idx=0)
        np.testing.assert_allclose(np.asarray(imp), g["demo_importance"][i], atol=1e-4)


def test_af_probs_and_cam(af_model):
    model, variables = af_model
    g = np.load(os.path.join(GOLD, "golden_af.npz"))
    cam_fn = GradCAM(model, variables, signal_length=5000, norm_first=False, eps=1e-9)

    for i, f in enumerate(_load_samples("single")):
        z = np.load(f, allow_pickle=True)
        x = jnp.asarray(z["ecg"].T[None])
        probs, cam = cam_fn(x, class_idx=0)
        np.testing.assert_allclose(np.asarray(probs)[0], g["probs"][i], atol=PROB_TOL)
        np.testing.assert_allclose(np.asarray(cam)[0], g["cam"][i], atol=CAM_TOL)


def test_pooling_floors_odd_lengths(baseline):
    # T=5000 -> 2500 -> 1250 -> 625 -> (conv tap at 625) -> pool floors to 312
    model, variables = baseline
    x = jnp.zeros((1, 5000, 12))
    a = model.apply(variables, x, False, method=model.features)
    assert a.shape == (1, 625, 256)
    logits = model.apply(variables, x, False)
    assert logits.shape == (1, 5)


def test_return_features(baseline):
    model, variables = baseline
    x = jnp.zeros((2, 5000, 12))
    logits, z = model.apply(variables, x, False, True)
    assert logits.shape == (2, 5) and z.shape == (2, 256)


def test_torch_init_distribution():
    """torch_init=True reproduces torch's default init distribution:
    kernels AND biases ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (vs flax's
    lecun_normal + zero bias).  Param counts/shapes are unchanged."""
    import numpy as np

    from ptbxl_tpu.models.factory import build_ecgcnn, build_multimodal

    model, v = build_ecgcnn(num_labels=5, seed=0, torch_init=True)
    w = np.asarray(v["params"]["blocks_0"]["conv"]["kernel"])  # [15, 12, 32]
    bound = (15 * 12) ** -0.5
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound  # actually uniform, not truncated
    # uniform std = bound/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.15 * bound
    b = np.asarray(v["params"]["blocks_0"]["conv"]["bias"])
    assert np.abs(b).max() > 0 and np.abs(b).max() <= bound

    hw = np.asarray(v["params"]["head"]["kernel"])  # [256, 5]
    hbound = 256 ** -0.5
    assert np.abs(hw).max() <= hbound

    # default init unchanged: zero biases
    _, v0 = build_ecgcnn(num_labels=5, seed=0)
    assert np.all(np.asarray(v0["params"]["blocks_0"]["conv"]["bias"]) == 0)
    # same tree structure either way
    import jax

    assert (jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v))

    _, vm = build_multimodal(num_labels=5, seed=0, torch_init=True)
    fw = np.asarray(vm["params"]["film_gen"]["kernel"])  # [64, 512]
    assert np.abs(fw).max() <= 64 ** -0.5
    d1 = np.asarray(vm["params"]["demo_encoder"]["fc1"]["kernel"])  # [5, 64]
    assert np.abs(d1).max() <= 5 ** -0.5
