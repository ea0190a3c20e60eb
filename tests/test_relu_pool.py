"""relu_max_pool2 (ops/relu_pool.py): forward identity with the flax
composite, Pallas-backward (interpret-mode) equivalence, and tie semantics.

The default impl is the XLA composite (the Pallas VJP is a documented
negative result kept behind PTBXL_TPU_POOL_BWD=pallas); these tests pin
both paths' math so the knob stays safe to flip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ptbxl_tpu.ops.relu_pool import (
    _jnp_bwd,
    _pallas_bwd,
    _relu_pool_pallas,
    _xla_relu_pool,
    relu_max_pool2,
)


def _flax_composite(h):
    return nn.max_pool(nn.relu(h), window_shape=(2,), strides=(2,), padding="VALID")


@pytest.mark.parametrize("shape", [(4, 16, 8), (3, 25, 16), (2, 625, 256)])
def test_forward_identical_to_flax(shape):
    x = jax.random.normal(jax.random.PRNGKey(sum(shape)), shape, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_xla_relu_pool(x)), np.asarray(_flax_composite(x)))
    np.testing.assert_array_equal(
        np.asarray(relu_max_pool2(x)), np.asarray(_flax_composite(x)))


@pytest.mark.parametrize("shape", [(4, 16, 8), (3, 25, 16), (2, 5000, 32),
                                   (1, 625, 256), (2, 2500, 64)])
def test_pallas_bwd_matches_autodiff(shape):
    """Interpret-mode kernel == XLA autodiff away from exact positive ties."""
    x = jax.random.normal(jax.random.PRNGKey(sum(shape) + 1), shape, jnp.float32)

    def loss(f):
        return jax.grad(lambda h: jnp.sum(jnp.sin(f(h))))(x)

    ref = np.asarray(loss(_xla_relu_pool))
    pal = np.asarray(loss(lambda h: _relu_pool_pallas(h, True)))
    # exclude windows with exact positive ties (even-split vs first-element
    # routing — both valid subgradients; probability ~0 on real data)
    T = shape[1]
    e = (T // 2) * 2
    xe, xo = np.asarray(x)[:, 0:e:2], np.asarray(x)[:, 1:e:2]
    tie = np.repeat((xe == xo) & (xe > 0), 2, axis=1)
    if T > e:
        tie = np.concatenate(
            [tie, np.zeros((shape[0], T - e, shape[2]), bool)], axis=1)
    np.testing.assert_allclose(ref[~tie], pal[~tie], atol=1e-6)


def test_pallas_bwd_tie_split():
    """A window of two equal positive values splits the cotangent evenly."""
    h = jnp.array([[[2.0], [2.0], [3.0], [1.0], [-1.0], [-2.0]]])  # [1, 6, 1]
    g = jnp.array([[[4.0], [6.0], [8.0]]])
    dh = np.asarray(_pallas_bwd(h, g, interpret=True))[0, :, 0]
    np.testing.assert_allclose(dh, [2.0, 2.0, 6.0, 0.0, 0.0, 0.0])
    dj = np.asarray(_jnp_bwd(h, g))[0, :, 0]
    np.testing.assert_allclose(dj, dh)


def test_odd_tail_zero_grad():
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 4), jnp.float32)
    g = jnp.ones((2, 3, 4), jnp.float32)
    for fn in (_jnp_bwd, lambda a, b: _pallas_bwd(a, b, interpret=True)):
        dh = np.asarray(fn(h, g))
        assert dh.shape == (2, 7, 4)
        np.testing.assert_array_equal(dh[:, 6], 0.0)


def test_force_xla_context():
    from ptbxl_tpu.ops.relu_pool import _impl, force_xla_pool_bwd

    with force_xla_pool_bwd():
        assert _impl() == "xla"
