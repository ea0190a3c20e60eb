"""Flax 1D-CNN ECG classifier — TPU-native rebuild of the reference ECGCNN.

Capability parity with reference src/models/ecg_cnn.py:23-68 (4 ConvBlocks
12->32->64->128->256, GAP, 256-d projection, linear head; 719,397 params for
5 labels), but designed for TPU/XLA:

* channels-last ``[B, T, C]`` layout so the channel dim rides the 128-wide
  lanes and convs lower onto the MXU
* an explicit ``features`` / ``tail`` split at the last conv's pre-activation,
  so Grad-CAM is a pure ``jax.vjp`` on ``tail`` (no hooks; reference used
  forward/backward hooks on the last Conv1d, grad_cam_1d.py:36)
* BatchNorm carried as a ``batch_stats`` collection; torch-compatible
  epsilon=1e-5 and momentum (torch 0.1 == flax 0.9)
* MaxPool(2) with VALID padding floors odd lengths exactly like torch
  (T=5000 -> 2500 -> 1250 -> 625 -> 312)

Numerical parity with converted reference weights is verified against golden
outputs in tests/test_model_parity.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ptbxl_tpu.ops.relu_pool import relu_max_pool2

# Numerical-parity note: this environment's default conv/dot precision reduces
# inputs to bf16 (fast on the MXU but ~1e-3 relative error).  The parity path
# uses "highest" (true f32); the perf path can relax to "default" (bf16 passes
# on the MXU) via the ``precision`` attribute.
PARITY_PRECISION = "highest"


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch's nn.Conv1d/Linear default weight init.

    kaiming_uniform(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in));
    fan_in = prod(shape[:-1]) covers both Dense [in, out] and Conv HIO
    [k, in, out] kernels.  Flax's default is lecun_normal + zero bias —
    a ~1.7x narrower weight distribution and no bias noise — which changes
    from-scratch training trajectories enough to matter on hard tasks
    (measured by tools/showdown.py --hard); ``torch_init=True`` on the
    models reproduces the reference's init distribution exactly
    (reference model: src/models/ecg_cnn.py via torch defaults).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = fan_in ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    The bias initializer only sees shape [out], so fan_in is closed over.
    """
    bound = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense_kwargs(torch_init: bool, fan_in: int):
    if not torch_init:
        return {}
    return {"kernel_init": torch_kernel_init, "bias_init": torch_bias_init(fan_in)}


class PhaseableConv(nn.Module):
    """Conv1d(k, SAME) with an optional phase-domain emission.

    Parameters are named/shaped/initialized exactly like the ``nn.Conv`` it
    replaces (``kernel`` [k, Cin, Cout], ``bias`` [Cout]) so checkpoints
    are interchangeable; the standard call replicates flax's lowering
    (promote dtype -> lax conv -> bias).  ``phase=True`` emits
    [B, T//2, 2, Cout] via ops/phase_conv.py — the training path that
    removes MaxPool's SelectAndScatter gradient.
    """

    features: int
    kernel_size: int = 15
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray, phase: bool = False) -> jnp.ndarray:
        from flax.linen.dtypes import promote_dtype

        from ptbxl_tpu.ops.phase_conv import phase_conv

        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        if phase:
            return phase_conv(x, kernel, bias, precision=self.precision)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), precision=self.precision)
        return y + bias.reshape((1, 1, -1))


class ConvBlock(nn.Module):
    """Conv1d(k=15, SAME) -> BatchNorm -> ReLU -> MaxPool(2).

    Mirrors reference ecg_cnn.py:5-20.  Exposes ``conv_only``/``post`` so a
    caller can tap the pre-BN conv activation (the Grad-CAM target).

    ``phase_train=True`` routes the train-mode forward through the
    phase-domain form (ops/phase_conv.py): same math, but the maxpool
    becomes an elementwise max over the phase axis — its VJP is a mask, not
    SelectAndScatter.  Eval/inference always uses the standard path (the
    golden-pinned graph); BN statistics are identical either way (the
    phase view reduces over the same B*T elements when T is even).
    """

    features: int
    kernel_size: int = 15
    pool: int = 2
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    torch_init: bool = False
    in_features: Optional[int] = None  # required when torch_init (bias fan_in)
    phase_train: bool = False

    def setup(self):
        k = self.kernel_size
        extra = {}
        if self.torch_init:
            if self.in_features is None:
                raise ValueError("torch_init requires in_features (bias fan_in)")
            extra = _dense_kwargs(True, self.in_features * k)
        self.conv = PhaseableConv(
            self.features,
            kernel_size=k,
            dtype=self.dtype,
            precision=self.precision,
            **extra,
        )
        # BatchNorm affine init (scale 1, bias 0) matches torch already
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)

    def conv_only(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)

    def post(self, a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.bn(a, use_running_average=not train)
        if self.pool == 2:
            # relu(pool(h)) == pool(relu(h)) (monotone); pool-first skips a
            # full-size relu temp and halves the relu backward.  A Pallas
            # pool VJP lives behind PTBXL_TPU_POOL_BWD=pallas (measured
            # negative result — ops/relu_pool.py docstring).
            return relu_max_pool2(h)
        h = nn.relu(h)
        return nn.max_pool(h, window_shape=(self.pool,), strides=(self.pool,), padding="VALID")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (train and self.phase_train and self.pool == 2
                and x.shape[1] % 2 == 0):
            h4 = self.conv(x, phase=True)                   # [B, U, 2, C]
            h4 = self.bn(h4, use_running_average=False)     # same stats as [B,T,C]
            return jnp.max(nn.relu(h4), axis=2)             # elementwise pool VJP
        return self.post(self.conv_only(x), train)


class ECGCNN(nn.Module):
    """CNN encoder for 12-lead ECG classification (channels-last).

    Args mirror the reference (ecg_cnn.py:32): ``feat_dim`` latent size,
    ``num_labels`` outputs. Input is ``[B, T, in_leads]``.
    """

    feat_dim: int = 256
    num_labels: int = 3
    channels: Sequence[int] = (32, 64, 128, 256)
    in_leads: int = 12  # used by Conv input inference and torch_init fan_in
    precision: Optional[str] = PARITY_PRECISION
    dtype: Optional[jnp.dtype] = jnp.float32
    torch_init: bool = False  # reference init distribution (torch_kernel_init)
    # phase-domain train-mode forward (ops/phase_conv.py): removes maxpool's
    # SelectAndScatter gradient; exact same math (see ConvBlock docstring).
    # Default OFF: measured NET-SLOWER at bs 4096 bf16 (step 230 ms vs the
    # standard path's 180 — the stride-2 conv's dgrad/wgrad lowerings and
    # the phase-tail elementwise passes cost more than the pool VJP saves;
    # docs/ARCHITECTURE.md "Training-step backward analysis").  Kept as an
    # exact, GSPMD-safe, tested alternative for future toolchains.
    phase_train: bool = False

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
        self.head = nn.Dense(self.num_labels, precision=self.precision, dtype=self.dtype,
                             **_dense_kwargs(self.torch_init, self.feat_dim))

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Blocks 0..n-2 fully + last block's conv: the Grad-CAM tap ``A``.

        Returns the last Conv1d pre-activation ``[B, T', C_last]`` (T'=625 for
        T=5000), exactly what the reference's forward hook captured.
        """
        for blk in self.blocks[:-1]:
            x = blk(x, train)
        return self.blocks[-1].conv_only(x)

    def tail(
        self, a: jnp.ndarray, train: bool = False, return_features: bool = False
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Last block's BN/ReLU/pool + GAP + proj + head, from the tap ``A``."""
        h = self.blocks[-1].post(a, train)
        g = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) == mean over time
        z = self.proj(g)
        logits = self.head(z)
        if return_features:
            return logits, z
        return logits

    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_features: bool = False
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """x: [B, T, in_leads] -> logits [B, num_labels] (or (logits, z))."""
        return self.tail(self.features(x, train), train, return_features)
