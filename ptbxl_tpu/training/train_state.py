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


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW matching torch.optim.AdamW defaults (reference: scripts/03:133)."""
    return optax.adamw(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def create_train_state(model, variables, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
