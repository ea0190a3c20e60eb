"""Device mesh and sharding layout for data-parallel (+ optional model-parallel)
training.

The reference has no distributed code at all — single device, DataLoader
workers only (SURVEY.md §2.6).  The TPU framework makes data parallelism a
first-class component: a ``('data', 'model')`` mesh over all chips, batches
sharded on 'data', parameters replicated (or optionally sharded on 'model'
for the wide Dense kernels).  Under ``jax.jit`` + GSPMD, gradient reductions
become ``psum`` over ICI and BatchNorm's global-batch statistics fall out of
plain ``jnp.mean`` over the sharded batch axis — no hand-written collectives.

The 719k-parameter model needs no TP/PP in practice; the 'model' axis exists
so the layout generalizes (and is exercised by the multi-chip dry run).
SP/CP/EP are deliberately out of scope: no attention, fixed T=5000, no MoE.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_leaf: str, shape, n_model: int) -> P:
    """Model-parallel layout rule: shard wide Dense kernels' output dim on
    'model' when divisible; everything else replicated."""
    if n_model <= 1:
        return P()
    if path_leaf == "kernel" and len(shape) == 2 and shape[1] % n_model == 0 and shape[1] >= 64:
        return P(None, "model")
    return P()


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree on the mesh according to the layout rules."""
    n_model = mesh.shape["model"]

    def place(path, leaf):
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = _param_spec(leaf_name, getattr(leaf, "shape", ()), n_model)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)
