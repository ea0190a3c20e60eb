"""Phase-packed conv lowering: exactness vs the plain BN-folded front.

The transformation (ops/phase_pack.py) is kept as a documented experiment —
measured perf-neutral on this backend because XLA's conv emitter already
packs output positions internally — but it must stay mathematically exact.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.ops.pallas.fused_ecgcnn import fold_bn_into_conv  # noqa: E402
from ptbxl_tpu.ops.pallas.hybrid_ecgcnn import _xla_front  # noqa: E402
from ptbxl_tpu.ops.phase_pack import phase_packed_front, prepack_front  # noqa: E402
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch  # noqa: E402


@pytest.mark.parametrize("t", [512, 400, 5000])
def test_phase_packed_front_exact(t, rng):
    model, variables = build_ecgcnn(num_labels=5, seed=0)
    folded = fold_bn_into_conv(variables)
    packed = prepack_front(folded)
    x = zscore_per_lead_batch(
        jnp.asarray(rng.standard_normal((2, t, 12)).astype(np.float32))
    )
    want = _xla_front(x, folded, 2, jnp.float32)
    got = jax.jit(
        lambda x, p: phase_packed_front(x, None, jnp.float32, packed=p)
    )(x, packed)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
