"""Multimodal ECG + demographics model with FiLM conditioning (Flax).

Capability parity with reference src/models/ecg_multimodal.py:19-99:
``ECGBackbone`` (ECGCNN minus head, 718,112 params), ``DemoEncoder`` MLP
(5->64->hidden, 4,544 params), and ``ECGMultimodal`` FiLM fusion
(gamma = 1 + tanh(g); z_cond = gamma * z_ecg + beta; 757,221 params total).

Same TPU-first conventions as ecg_cnn.py: channels-last [B, T, C], explicit
``features``/``tail`` split for vjp Grad-CAM at the last conv pre-activation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ptbxl_tpu.models.ecg_cnn import PARITY_PRECISION, ConvBlock, _dense_kwargs


class ECGBackbone(nn.Module):
    """1D-CNN encoder: [B, T, in_leads] -> z [B, feat_dim].

    Reference: ecg_multimodal.py:19-41.
    """

    feat_dim: int = 256
    channels: Sequence[int] = (32, 64, 128, 256)
    in_leads: int = 12
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    torch_init: bool = False  # reference init distribution (ecg_cnn.py)
    phase_train: bool = False  # phase-domain train forward (see ecg_cnn.py; default off — measured net-slower)

    def setup(self):
        cins = [self.in_leads] + list(self.channels[:-1])
        self.blocks = [
            ConvBlock(c, precision=self.precision, dtype=self.dtype,
                      torch_init=self.torch_init, in_features=cin,
                      phase_train=self.phase_train)
            for c, cin in zip(self.channels, cins)
        ]
        self.proj = nn.Dense(self.feat_dim, precision=self.precision, dtype=self.dtype,
                             **_dense_kwargs(self.torch_init, self.channels[-1]))

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Grad-CAM tap: last conv pre-activation [B, T', C_last]."""
        for blk in self.blocks[:-1]:
            x = blk(x, train)
        return self.blocks[-1].conv_only(x)

    def tail_z(self, a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.blocks[-1].post(a, train)
        g = jnp.mean(h, axis=1)
        return self.proj(g)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.tail_z(self.features(x, train), train)


class DemoEncoder(nn.Module):
    """MLP for [age_norm, sex_id, height_norm, weight_norm, pacemaker].

    Reference: ecg_multimodal.py:44-59 — Linear(5,64) ReLU Linear(64,hidden) ReLU.
    """

    hidden_dim: int = 64
    in_dim: int = 5
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    torch_init: bool = False

    def setup(self):
        self.fc1 = nn.Dense(64, precision=self.precision, dtype=self.dtype,
                            **_dense_kwargs(self.torch_init, self.in_dim))
        self.fc2 = nn.Dense(self.hidden_dim, precision=self.precision, dtype=self.dtype,
                            **_dense_kwargs(self.torch_init, 64))

    def __call__(self, x_demo: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(self.fc1(x_demo))
        return nn.relu(self.fc2(h))


class ECGMultimodal(nn.Module):
    """FiLM fusion of ECG features and demographic features.

    Reference: ecg_multimodal.py:62-99.  ``ecg_feat_dim`` aliases ``feat_dim``
    at the construction boundary (handled by callers/config; the reference
    accepts both kwargs, ecg_multimodal.py:79-80).
    """

    feat_dim: int = 256
    demo_dim: int = 5
    num_labels: int = 5
    demo_hidden_dim: int = 64
    in_leads: int = 12
    channels: Sequence[int] = (32, 64, 128, 256)
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    torch_init: bool = False
    phase_train: bool = False  # phase-domain train forward (see ecg_cnn.py; default off — measured net-slower)

    def setup(self):
        self.ecg_backbone = ECGBackbone(
            feat_dim=self.feat_dim,
            channels=self.channels,
            in_leads=self.in_leads,
            precision=self.precision,
            dtype=self.dtype,
            torch_init=self.torch_init,
            phase_train=self.phase_train,
        )
        # the fusion tail follows the model dtype like the backbone does —
        # a bf16-activation config must not silently run a mixed f32 tail
        self.demo_encoder = DemoEncoder(
            hidden_dim=self.demo_hidden_dim, in_dim=self.demo_dim,
            precision=self.precision, dtype=self.dtype,
            torch_init=self.torch_init,
        )
        self.film_gen = nn.Dense(2 * self.feat_dim, precision=self.precision,
                                 dtype=self.dtype,
                                 **_dense_kwargs(self.torch_init, self.demo_hidden_dim))
        self.head = nn.Dense(self.num_labels, precision=self.precision,
                             dtype=self.dtype,
                             **_dense_kwargs(self.torch_init, self.feat_dim))

    def _fuse(self, z_ecg: jnp.ndarray, x_demo: jnp.ndarray) -> jnp.ndarray:
        h_demo = self.demo_encoder(x_demo)
        film_params = self.film_gen(h_demo)
        gamma, beta = jnp.split(film_params, 2, axis=-1)
        gamma = 1.0 + jnp.tanh(gamma)
        z_cond = gamma * z_ecg + beta
        return self.head(z_cond)

    def features(self, x_ecg: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Grad-CAM tap on the ECG branch (reference script 12 taps
        model.ecg_backbone.backbone[-1].net[0])."""
        return self.ecg_backbone.features(x_ecg, train)

    def tail(self, a: jnp.ndarray, x_demo: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        z_ecg = self.ecg_backbone.tail_z(a, train)
        return self._fuse(z_ecg, x_demo)

    def __call__(
        self, x_ecg: jnp.ndarray, x_demo: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """x_ecg: [B, T, in_leads]; x_demo: [B, 5] -> logits [B, num_labels]."""
        return self.tail(self.features(x_ecg, train), x_demo, train)
