"""Seeding utilities.

The reference seeds ``random``/``numpy``/``torch`` and pins cuDNN determinism
(reference: src/utils/seed.py:7-14).  In JAX, determinism is the default: all
device randomness flows through explicit ``jax.random.PRNGKey`` streams.  We
keep a ``set_seed`` entry point with the same name and host-side effect
(python/numpy RNGs), and return a PRNGKey for the device-side stream.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42):
    """Seed host RNGs and return a fresh ``jax.random.PRNGKey``.

    Mirrors the reference's set_seed (src/utils/seed.py:7-14).  Importing jax
    lazily keeps this module usable by pure-host tooling (CSV/plot scripts).
    """
    random.seed(seed)
    np.random.seed(seed)
    try:
        import jax

        return jax.random.PRNGKey(seed)
    except Exception:  # pragma: no cover - jax always present in this env
        return None


def key_from_seed(seed: int):
    import jax

    return jax.random.PRNGKey(seed)
