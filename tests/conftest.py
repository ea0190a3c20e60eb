"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip data-parallel sharding is
exercised hermetically (SURVEY.md §4): set XLA flags BEFORE jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env presets JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: the parity tests jit several full-length
# models; caching makes re-runs of the suite fast.
try:
    import jax

    # The driver environment pins JAX_PLATFORMS=axon (TPU) at a level the env
    # var alone doesn't override; force the CPU backend via config.
    jax.config.update("jax_platforms", "cpu")
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from tests.fixtures.synthetic_ptbxl import make_synthetic_ptbxl  # noqa: E402


@pytest.fixture(scope="session")
def ptbxl_dir(tmp_path_factory):
    """A tiny hermetic PTB-XL-shaped dataset on disk (WFDB records + CSVs)."""
    root = tmp_path_factory.mktemp("ptbxl")
    make_synthetic_ptbxl(str(root), n_records=40, n_samples=512, seed=0)
    return str(root)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
