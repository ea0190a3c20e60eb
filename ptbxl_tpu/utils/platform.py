"""Backend selection helper for CLI entry points.

The driver environment pins ``JAX_PLATFORMS=axon`` (TPU) in a way the plain
environment variable cannot override once the plugin registers, so hermetic
CPU runs (tests / CI / machines without the TPU tunnel) set
``PTBXL_TPU_PLATFORM=cpu`` and entry points call ``apply_platform_env()``
before touching any jax API that initializes backends.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("PTBXL_TPU_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
