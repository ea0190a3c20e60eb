"""Predictor serving API."""

import glob
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ptbxl_tpu.inference import Predictor  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(HERE, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")


@pytest.fixture(scope="module")
def predictor():
    # demo-pack signals are pre-normalized; z-score of a z-scored signal is
    # ~identity so normalize=True stays correct for raw AND normalized input
    return Predictor.from_checkpoint(CKPT, engine="xla")


def test_matches_golden_probs(predictor):
    g = np.load(os.path.join(HERE, "tests/golden/golden_baseline.npz"))
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])  # [7, 12, 5000]
    probs = predictor(sigs)
    np.testing.assert_allclose(probs, g["probs"], atol=5e-4)


def test_layout_autodetect(predictor):
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sig = np.load(files[0], allow_pickle=True)["ecg"]  # [12, 5000]
    p1 = predictor(sig[None])  # [1, 12, T]
    p2 = predictor(sig.T[None])  # [1, T, 12]
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_chunking(predictor):
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])
    small = Predictor.from_checkpoint(CKPT, engine="xla", chunk_size=3)
    np.testing.assert_allclose(small(sigs), predictor(sigs), atol=1e-6)


def test_classes_loaded(predictor):
    assert predictor.classes == ["MI", "STTC", "HYP", "CD", "NORM"]


def test_multimodal_predictor_matches_golden():
    g = np.load(os.path.join(HERE, "tests/golden/golden_multimodal.npz"))
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/multimodal/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])
    demos = np.stack([np.load(f, allow_pickle=True)["demo"] for f in files])
    mm = Predictor.from_checkpoint(
        os.path.join(HERE, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz"),
        arch="multimodal", engine="xla",
    )
    probs = mm(sigs, demo=demos)
    np.testing.assert_allclose(probs, g["probs"], atol=5e-4)

    with pytest.raises(ValueError, match="demo"):
        mm(sigs)  # multimodal requires demographics


def test_multimodal_pallas_engine_interpret_parity():
    """Fused multimodal kernel (interpret mode) matches the XLA engine."""
    from ptbxl_tpu.models.params_io import load_npz
    from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_multimodal, fused_multimodal_probs
    from ptbxl_tpu.models import ECGMultimodal
    import jax.numpy as jnp

    variables, _ = load_npz(os.path.join(HERE, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz"))
    model = ECGMultimodal(num_labels=5)
    folded = fold_multimodal(variables)
    f = sorted(glob.glob(os.path.join(HERE, "data/demo/multimodal/*.npz")))[0]
    z = np.load(f, allow_pickle=True)
    x = jnp.asarray(z["ecg"].T[None])
    d = jnp.asarray(z["demo"][None])
    got = fused_multimodal_probs(x, d, folded, normalize=False, interpret=True)
    want = jax.nn.sigmoid(model.apply(variables, x, d, False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_matches_single_device(predictor):
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])
    dp = Predictor.from_checkpoint(CKPT, engine="xla", data_parallel=True, chunk_size=8)
    np.testing.assert_allclose(dp(sigs), predictor(sigs), atol=1e-5)


def test_predictor_default_precision_close_to_parity():
    """precision='default' (bf16 serving) stays within the bench gate."""
    import glob
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    from ptbxl_tpu.inference import Predictor

    p_hi = Predictor.from_checkpoint(ckpt, engine="xla")
    p_lo = Predictor.from_checkpoint(ckpt, engine="xla", precision="default")
    files = sorted(glob.glob(os.path.join(here, "data/demo/single/*.npz")))[:3]
    for f in files:
        z = np.load(f, allow_pickle=True)
        hi = p_hi(z["ecg"][None])
        lo = p_lo(z["ecg"][None])
        assert hi.dtype == np.float32 and lo.dtype == np.float32
        assert np.abs(hi - lo).max() < 5e-3


def test_predictor_default_precision_multimodal_and_af():
    import glob
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ptbxl_tpu.inference import Predictor

    mm_ckpt = os.path.join(here, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz")
    p_hi = Predictor.from_checkpoint(mm_ckpt, arch="multimodal", engine="xla")
    p_lo = Predictor.from_checkpoint(mm_ckpt, arch="multimodal", engine="xla",
                                     precision="default")
    for f in sorted(glob.glob(os.path.join(here, "data/demo/multimodal/*.npz")))[:2]:
        z = np.load(f, allow_pickle=True)
        hi = p_hi(z["ecg"][None], demo=z["demo"][None])
        lo = p_lo(z["ecg"][None], demo=z["demo"][None])
        assert np.abs(hi - lo).max() < 5e-3

    af_ckpt = os.path.join(here, "outputs/af_binary/ckpts/af_binary_best.npz")
    if os.path.exists(af_ckpt):
        a_hi = Predictor.from_checkpoint(af_ckpt, num_labels=1, engine="xla")
        a_lo = Predictor.from_checkpoint(af_ckpt, num_labels=1, engine="xla",
                                         precision="default")
        z = np.load(sorted(glob.glob(os.path.join(here, "data/demo/single/*.npz")))[0],
                    allow_pickle=True)
        assert np.abs(a_hi(z["ecg"][None]) - a_lo(z["ecg"][None])).max() < 5e-3


def test_empty_input_returns_empty(predictor):
    out = predictor(np.zeros((0, 12, 5000), np.float32))
    assert out.shape == (0, 5) and out.dtype == np.float32


def test_demo_count_mismatch_raises():
    mm = Predictor.from_checkpoint(
        os.path.join(HERE, "outputs/ecg_multimodal/ckpts/ecg_multimodal_best.npz"),
        arch="multimodal", engine="xla",
    )
    sigs = np.zeros((3, 12, 5000), np.float32)
    with pytest.raises(ValueError, match="demo must be"):
        mm(sigs, demo=np.zeros((2, 5), np.float32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_default_engine_resolves(predictor):
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])
    dp = Predictor.from_checkpoint(CKPT, data_parallel=True, chunk_size=8)
    assert dp.engine == "xla"  # 'auto' resolves instead of raising
    np.testing.assert_allclose(dp(sigs), predictor(sigs), atol=1e-5)


def test_small_batches_bucket_to_pow2(predictor):
    """Distinct small N reuse O(log chunk_size) compiled shapes (pads are
    masked); results must equal per-sample inference."""
    files = sorted(glob.glob(os.path.join(HERE, "data/demo/single/*.npz")))
    sigs = np.stack([np.load(f, allow_pickle=True)["ecg"] for f in files])
    for n in (1, 2, 3, 5, 7):
        np.testing.assert_allclose(
            predictor(sigs[:n]), predictor(sigs)[:n], atol=1e-6
        )
