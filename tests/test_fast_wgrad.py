"""conv1d_fast_wgrad (ops/fast_wgrad.py): the phase-packed weight gradient
equals XLA autodiff's, the forward is the identical lax conv, and the
non-divisible-T fallback engages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ptbxl_tpu.ops.fast_wgrad import _pick_phases, conv1d_fast_wgrad


@pytest.mark.parametrize(
    "B,T,Ci,Co,k,P",
    [(3, 40, 12, 32, 15, 8), (2, 48, 5, 7, 15, 4),
     (2, 30, 4, 6, 7, 2), (2, 33, 4, 6, 7, 8)],  # 33 % 8 != 0 -> fallback
)
def test_grads_match_autodiff(B, T, Ci, Co, k, P):
    kx, kk = jax.random.split(jax.random.PRNGKey(B * T + k))
    x = jax.random.normal(kx, (B, T, Ci))
    w = jax.random.normal(kk, (k, Ci, Co))
    pad = (k // 2, k // 2)

    def ref(x, w):
        y = lax.conv_general_dilated(
            x, w, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.sum(jnp.sin(y))

    def fast(x, w):
        return jnp.sum(jnp.sin(conv1d_fast_wgrad(x, w, pad, None, P)))

    vr, (gxr, gwr) = jax.value_and_grad(ref, argnums=(0, 1))(x, w)
    vf, (gxf, gwf) = jax.value_and_grad(fast, argnums=(0, 1))(x, w)
    assert float(vr) == float(vf)  # identical primal
    np.testing.assert_array_equal(np.asarray(gxr), np.asarray(gxf))
    np.testing.assert_allclose(np.asarray(gwr), np.asarray(gwf),
                               rtol=1e-5, atol=1e-4)


def test_pick_phases():
    assert _pick_phases(5000) == 8
    assert _pick_phases(2500) == 4
    assert _pick_phases(1250) == 2
    assert _pick_phases(625) == 1
