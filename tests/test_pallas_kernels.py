"""Pallas kernels vs the XLA reference path (interpret mode on CPU).

On real TPU hardware the same kernels are compiled by Mosaic and benchmarked
(with a demo-pack parity gate) in bench.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.ops.pallas.fused_ecgcnn import (  # noqa: E402
    fold_bn_into_conv,
    fused_ecgcnn_probs,
)
from ptbxl_tpu.ops.pallas.zscore import (  # noqa: E402
    zscore_pallas,
    zscore_pallas_wide,
)
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch  # noqa: E402


def test_zscore_kernel_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((3, 256, 12)).astype(np.float32) * 4 + 2)
    got = zscore_pallas(x, interpret=True)
    want = zscore_per_lead_batch(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_zscore_wide_kernel_matches_xla(rng):
    """Lane-remap kernel: per-lead fold via the [W,W] mod-12 matmul, batch
    padding to block_b, and bf16 out_dtype.  Kept in-tree as the measured
    negative result for the zscore headroom (tools/probe_zscore.py: boundary
    reshapes are real copies on this backend; the one-pass XLA form ships)."""
    x = jnp.asarray(rng.standard_normal((5, 240, 12)).astype(np.float32) * 4 + 2)
    want = np.asarray(zscore_per_lead_batch(x))
    got = zscore_pallas_wide(x, width=36, block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    got_b = zscore_pallas_wide(x, out_dtype=jnp.bfloat16, width=36, block_b=2,
                               interpret=True)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32), want, atol=2e-2)


@pytest.fixture(scope="module")
def small_model():
    model, variables = build_ecgcnn(num_labels=5, seed=0)
    return model, variables, fold_bn_into_conv(variables)


def test_fused_forward_matches_model(small_model, rng):
    model, variables, folded = small_model
    x = jnp.asarray(rng.standard_normal((2, 512, 12)).astype(np.float32) * 2)
    got = fused_ecgcnn_probs(x, folded, normalize=True, interpret=True)
    want = jax.nn.sigmoid(model.apply(variables, zscore_per_lead_batch(x), False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_forward_prenormalized(small_model, rng):
    model, variables, folded = small_model
    x = zscore_per_lead_batch(
        jnp.asarray(rng.standard_normal((2, 512, 12)).astype(np.float32))
    )
    got = fused_ecgcnn_probs(x, folded, normalize=False, interpret=True)
    want = jax.nn.sigmoid(model.apply(variables, x, False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_forward_odd_pool_floor(small_model, rng):
    """T=400 -> 200 -> 100 -> 50 -> 25 -> pool floors to 12 like torch."""
    model, variables, folded = small_model
    x = jnp.asarray(rng.standard_normal((1, 400, 12)).astype(np.float32))
    got = fused_ecgcnn_probs(x, folded, normalize=True, interpret=True)
    want = jax.nn.sigmoid(model.apply(variables, zscore_per_lead_batch(x), False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_hybrid_forward_matches_model(small_model, rng):
    """Hybrid path (XLA front + fused deep-conv/tail Pallas kernel)."""
    from ptbxl_tpu.ops.pallas.hybrid_ecgcnn import hybrid_ecgcnn_probs

    model, variables, folded = small_model
    x = jnp.asarray(rng.standard_normal((3, 512, 12)).astype(np.float32) * 2)
    want = jax.nn.sigmoid(model.apply(variables, zscore_per_lead_batch(x), False))
    got = hybrid_ecgcnn_probs(
        x, folded, compute_dtype=jnp.float32, interpret=True, block_b=2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # bf16 compute stays within the bench parity gate
    got16 = hybrid_ecgcnn_probs(
        x, folded, compute_dtype=jnp.bfloat16, interpret=True, block_b=2
    )
    assert float(np.abs(np.asarray(got16) - np.asarray(want)).max()) < 5e-3


def test_hybrid_batch_padding(small_model, rng):
    """Batch not divisible by block_b: padded rows must not leak."""
    from ptbxl_tpu.ops.pallas.hybrid_ecgcnn import hybrid_ecgcnn_probs

    model, variables, folded = small_model
    x = jnp.asarray(rng.standard_normal((5, 512, 12)).astype(np.float32))
    got = hybrid_ecgcnn_probs(
        x, folded, compute_dtype=jnp.float32, interpret=True, block_b=4
    )
    want = jax.nn.sigmoid(model.apply(variables, zscore_per_lead_batch(x), False))
    assert got.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bn_folding_against_golden_checkpoint():
    """Folded weights on the real reference checkpoint reproduce golden probs."""
    import glob
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ptbxl_tpu.models.params_io import load_npz

    variables, _ = load_npz(os.path.join(here, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz"))
    folded = fold_bn_into_conv(variables)
    g = np.load(os.path.join(here, "tests/golden/golden_baseline.npz"))

    files = sorted(glob.glob(os.path.join(here, "data/demo/single/*.npz")))
    # demo-pack signals are already normalized -> normalize=False
    for i, f in enumerate(files[:2]):  # 2 samples keep interpret mode fast
        z = np.load(f, allow_pickle=True)
        x = jnp.asarray(z["ecg"].T[None])
        probs = fused_ecgcnn_probs(x, folded, normalize=False, interpret=True)
        np.testing.assert_allclose(np.asarray(probs)[0], g["probs"][i], atol=1e-4)
