"""Functional train state: params + BatchNorm stats + optimizer state.

The reference's state is implicit in mutable nn.Module + torch optimizer
internals; here it is one explicit pytree threaded through a jitted step
(idiomatic JAX).  ``create_train_state`` also wires the reference's AdamW
configuration (torch defaults: betas (0.9, 0.999), eps 1e-8, decoupled weight
decay applied to ALL parameters including BatchNorm affine — reference:
scripts/03:133 passes model.parameters() unfiltered).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(
    lr: float, weight_decay: float, warmup_steps: int = 0
) -> optax.GradientTransformation:
    """AdamW matching torch.optim.AdamW defaults (reference: scripts/03:133).

    ``warmup_steps > 0`` ramps the LR linearly 0 -> lr over that many steps,
    then holds it constant — the standard stabilizer for large-batch
    training (see :func:`large_batch_lr`); the reference has no schedule, so
    the default (0) preserves its constant-LR behavior exactly.
    """
    schedule = lr if warmup_steps <= 0 else optax.linear_schedule(
        init_value=0.0, end_value=lr, transition_steps=warmup_steps
    )
    return optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def large_batch_lr(
    base_lr: float, batch_size: int, ref_batch_size: int = 64
) -> float:
    """Linear LR scaling for large-batch training (Goyal et al., 2017):
    lr = base_lr * batch_size / ref_batch_size.

    The reference trains at batch 64 with lr 1.5e-3
    (configs/ecg_baseline.yaml); scaling the TPU data-parallel batch up
    without scaling the LR under-trains (same number of epochs, 1/k the
    steps, same per-step movement).  Pair with ``warmup_steps`` — the scaled
    LR is unstable for a freshly initialized BN-heavy net.  Convergence is
    gated by tests/test_learning.py[large-batch].
    """
    return base_lr * (batch_size / float(ref_batch_size))


def create_train_state(model, variables, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
