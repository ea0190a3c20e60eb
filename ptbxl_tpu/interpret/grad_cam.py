"""Grad-CAM for 1D ECG models, re-derived via ``jax.vjp`` (no hooks).

The reference registers forward/backward hooks on the last Conv1d and runs
``score.backward()`` (reference: src/interpretability/grad_cam_1d.py:36,
scripts/00_demo_inference.py:29-37).  Here the models expose an explicit
``features``/``tail`` split at exactly that tap point, so the cotangent
dY/dA is one ``jax.vjp`` on the tail — numerically identical, jittable, and
batchable with ``vmap``.

Algorithm (shared by all 4 reference variants, SURVEY.md §2.4):
  A = last-conv pre-activation [B, T', C]
  dYdA = vjp of logits[:, class_idx] w.r.t. A
  w = mean_t(dYdA)                      # [B, 1, C]
  cam = relu(sum_c w * A)               # [B, T']
  -> normalize / linearly interpolate to T

The reference has two orderings:
* ``norm_first=True``  — library GradCAM1D: min-max normalize (guarded: only
  divide if max>0) THEN interpolate (grad_cam_1d.py:88-102)
* ``norm_first=False`` — demo/multimodal/AF scripts: interpolate THEN
  normalize with ``(cam - min) / (max + eps)``; eps=1e-9 for scripts 00/13
  and 1e-8 for script 12 (00:52-61, 12:66-73, 13:66-76)

Interpolation matches ``F.interpolate(mode="linear", align_corners=False)``
exactly (half-pixel centers, edge clamp).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def linear_interpolate_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resize the last axis to ``out_len`` with torch-style linear interp.

    Half-pixel sampling: src = (i + 0.5) * L_in/L_out - 0.5, clamped to
    [0, L_in-1]; matches F.interpolate(mode='linear', align_corners=False).
    """
    import numpy as _np

    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    # positions depend only on static shapes: compute in float64 on the host
    # so boundary floors match torch exactly, and bake them as constants
    scale = in_len / out_len
    pos = (_np.arange(out_len, dtype=_np.float64) + 0.5) * scale - 0.5
    pos = _np.clip(pos, 0.0, in_len - 1.0)
    i0 = _np.floor(pos).astype(_np.int32)
    i1 = _np.minimum(i0 + 1, in_len - 1)
    w = jnp.asarray((pos - i0), dtype=x.dtype)
    return x[..., i0] * (1.0 - w) + x[..., i1] * w


def _minmax_guarded(cam: jnp.ndarray) -> jnp.ndarray:
    """cam -= min; divide by max only when max > 0 (grad_cam_1d.py:45-56)."""
    cam = cam - jnp.min(cam, axis=-1, keepdims=True)
    mx = jnp.max(cam, axis=-1, keepdims=True)
    return jnp.where(mx > 0, cam / jnp.where(mx > 0, mx, 1.0), cam)


def _minmax_eps(cam: jnp.ndarray, eps: float) -> jnp.ndarray:
    """(cam - min) / (max + eps) (demo-script variants, 00:59-61)."""
    cam = cam - jnp.min(cam, axis=-1, keepdims=True)
    return cam / (jnp.max(cam, axis=-1, keepdims=True) + eps)


class GradCAM:
    """Jitted (probs, cam) computation for a Flax model with features/tail.

    Args:
        model: a module exposing ``features(x, train)`` and
            ``tail(a, [x_demo,] train)`` methods (ECGCNN / ECGMultimodal).
        variables: {'params': ..., 'batch_stats': ...}
        signal_length: output CAM length (None keeps T'),
        norm_first: normalize-then-interpolate (library variant) vs
            interpolate-then-normalize (demo variants).
        eps: epsilon for the non-guarded normalization (ignored if norm_first).
        multimodal: whether tail takes an extra demographics input.

    Input convention is channels-last ``[B, T, C]`` like the models; callers
    holding reference-layout ``[12, T]`` arrays transpose at the boundary.
    """

    def __init__(
        self,
        model,
        variables,
        signal_length: Optional[int] = None,
        norm_first: bool = False,
        eps: float = 1e-9,
        multimodal: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.signal_length = signal_length
        self.norm_first = norm_first
        self.eps = eps
        self.multimodal = multimodal
        self._fn = jax.jit(self._build(), static_argnames=())
        self._multi_fn = jax.jit(self._build_multi(), static_argnames=())

    def _build(self) -> Callable:
        model, variables = self.model, self.variables
        sig_len, norm_first, eps = self.signal_length, self.norm_first, self.eps
        multimodal = self.multimodal

        def fn(x: jnp.ndarray, class_idx: jnp.ndarray, *extra) -> Tuple[jnp.ndarray, jnp.ndarray]:
            a = model.apply(variables, x, False, method=model.features)

            if multimodal:
                (x_demo,) = extra

                def tail(a_):
                    return model.apply(variables, a_, x_demo, False, method=model.tail)

            else:

                def tail(a_):
                    return model.apply(variables, a_, False, method=model.tail)

            logits, vjp_fn = jax.vjp(tail, a)
            num_labels = logits.shape[-1]
            # cotangent = d(sum_b logits[b, class_idx]) / d(logits)
            ct = jax.nn.one_hot(class_idx, num_labels, dtype=logits.dtype)
            ct = jnp.broadcast_to(ct, logits.shape)
            (dyda,) = vjp_fn(ct)

            w = jnp.mean(dyda, axis=1, keepdims=True)  # GAP over time  [B,1,C]
            cam = jnp.sum(w * a, axis=-1)  # [B, T']
            cam = jax.nn.relu(cam)

            if norm_first:
                cam = _minmax_guarded(cam)
                if sig_len is not None:
                    cam = linear_interpolate_1d(cam, sig_len)
            else:
                if sig_len is not None:
                    cam = linear_interpolate_1d(cam, sig_len)
                cam = _minmax_eps(cam, eps)

            probs = jax.nn.sigmoid(logits)
            return probs, cam

        return fn

    def _build_multi(self) -> Callable:
        """Multi-class variant: ONE forward, one vjp, stacked cotangents.

        The features pass (the four conv blocks, ~99% of the FLOPs) and the
        tail linearization run once; each class then costs only a pullback of
        its one-hot cotangent through the (linear) vjp, vmapped over the
        class axis.  Numerically identical to per-class calls.
        """
        model, variables = self.model, self.variables
        sig_len, norm_first, eps = self.signal_length, self.norm_first, self.eps
        multimodal = self.multimodal

        def fn(x: jnp.ndarray, class_indices: jnp.ndarray, *extra):
            a = model.apply(variables, x, False, method=model.features)

            if multimodal:
                (x_demo,) = extra

                def tail(a_):
                    return model.apply(variables, a_, x_demo, False, method=model.tail)

            else:

                def tail(a_):
                    return model.apply(variables, a_, False, method=model.tail)

            logits, vjp_fn = jax.vjp(tail, a)
            num_labels = logits.shape[-1]
            cts = jax.nn.one_hot(class_indices, num_labels, dtype=logits.dtype)  # [n, L]
            cts = jnp.broadcast_to(cts[:, None, :], (cts.shape[0],) + logits.shape)
            dydas = jax.vmap(lambda ct: vjp_fn(ct)[0])(cts)  # [n, B, T', C]

            w = jnp.mean(dydas, axis=2, keepdims=True)  # [n, B, 1, C]
            cams = jax.nn.relu(jnp.sum(w * a[None], axis=-1))  # [n, B, T']

            if norm_first:
                cams = _minmax_guarded(cams)
                if sig_len is not None:
                    cams = linear_interpolate_1d(cams, sig_len)
            else:
                if sig_len is not None:
                    cams = linear_interpolate_1d(cams, sig_len)
                cams = _minmax_eps(cams, eps)

            return jax.nn.sigmoid(logits), cams

        return fn

    def __call__(self, x, class_idx: int = 0, x_demo=None):
        """x: [B, T, C] -> (probs [B, L], cam [B, signal_length])."""
        ci = jnp.asarray(class_idx, dtype=jnp.int32)
        if self.multimodal:
            return self._fn(x, ci, x_demo)
        return self._fn(x, ci)

    def multi(self, x, class_indices, x_demo=None):
        """x: [B, T, C], class_indices: [n] -> (probs [B, L], cams [n, B, T])."""
        ci = jnp.asarray(class_indices, dtype=jnp.int32)
        if self.multimodal:
            return self._multi_fn(x, ci, x_demo)
        return self._multi_fn(x, ci)


def batch_grad_cam(
    cam_fn: "GradCAM", x: jnp.ndarray, class_indices, x_demo=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CAMs for a batch of samples across MULTIPLE classes in one pass.

    Returns (probs [B, L], cams [n_classes, B, T]).  Computes the conv
    features and the tail vjp once; per-class one-hot cotangents are pulled
    back through a single vmapped vjp (see GradCAM._build_multi), so 5-class
    CAMs cost ~one forward instead of five.
    """
    return cam_fn.multi(x, class_indices, x_demo=x_demo)


def demo_importance(model, variables, x_ecg, x_demo, class_idx: int) -> jnp.ndarray:
    """|grad x input| saliency on the demographic vector, max-normalized.

    Reference: scripts/12_grad_cam_ecg_demo.py:78-97.
    """

    def score_fn(d):
        logits = model.apply(variables, x_ecg, d, False)
        return jnp.sum(logits[:, class_idx])

    grad = jax.grad(score_fn)(x_demo)[0]
    imp = jnp.abs(grad * x_demo[0])
    mx = jnp.max(imp)
    return jnp.where(mx > 0, imp / mx, imp)
