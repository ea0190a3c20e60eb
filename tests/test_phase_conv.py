"""Phase-domain training path (ops/phase_conv.py + PhaseableConv):

- phase_conv == SAME stride-1 conv, reshaped (all taps, both parities)
- full-model train step: phase forward == standard forward to f32
  reduction-order noise (loss, gradients, BN batch stats)
- eval path is BIT-identical (phase mode never engages outside training)
- odd-T blocks auto-fall back to the standard path
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import lax

from ptbxl_tpu.models.ecg_cnn import ECGCNN
from ptbxl_tpu.ops.phase_conv import phase_conv


@pytest.mark.parametrize(
    "B,T,Ci,Co,k", [(2, 16, 3, 5, 15), (3, 40, 12, 32, 15), (2, 10, 2, 4, 7)]
)
def test_phase_conv_matches_same_conv(B, T, Ci, Co, k):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(T + k), 3)
    x = jax.random.normal(kx, (B, T, Ci))
    w = jax.random.normal(kw, (k, Ci, Co))
    b = jax.random.normal(kb, (Co,))
    ref = lax.conv_general_dilated(
        x, w, (1,), [(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC")) + b
    out = phase_conv(x, w, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(B, T // 2, 2, Co)),
        rtol=1e-6, atol=1e-5)


def test_phase_conv_rejects_odd_t_and_even_k():
    x = jnp.zeros((1, 9, 2))
    w = jnp.zeros((3, 2, 4))
    with pytest.raises(ValueError, match="even T"):
        phase_conv(x, w)
    with pytest.raises(ValueError, match="odd k"):
        phase_conv(jnp.zeros((1, 8, 2)), jnp.zeros((4, 2, 4)))


def _train_loss(model, variables, x, y):
    def f(params):
        logits, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
        return loss, mut["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    return loss, stats, grads


@pytest.mark.parametrize("T", [80, 200])  # 200 -> 100/50/25: block 3 odd-T fallback
def test_full_model_phase_equivalence(T):
    kw = dict(feat_dim=64, num_labels=3, channels=(8, 12, 16, 24))
    m_ph = ECGCNN(phase_train=True, **kw)
    m_std = ECGCNN(phase_train=False, **kw)
    variables = m_std.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 12)))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, T, 12))
    y = (jax.random.uniform(jax.random.PRNGKey(2), (4, 3)) > 0.5).astype(
        jnp.float32)

    l1, s1, g1 = _train_loss(m_ph, variables, x, y)
    l2, s2, g2 = _train_loss(m_std, variables, x, y)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # eval path: bit-identical (phase mode must not touch inference)
    e1 = m_ph.apply(variables, x, False)
    e2 = m_std.apply(variables, x, False)
    assert bool(jnp.all(e1 == e2))
