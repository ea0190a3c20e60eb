"""Backend selection helper for CLI entry points.

The driver environment pins ``JAX_PLATFORMS=axon`` (TPU) in a way the plain
environment variable cannot override once the plugin registers, so hermetic
CPU runs (tests / CI / machines without the TPU tunnel) set
``PTBXL_TPU_PLATFORM=cpu`` and entry points call ``apply_platform_env()``
before touching any jax API that initializes backends.

``PTBXL_TPU_HOST_DEVICES=N`` additionally exposes N virtual host devices
(CPU backend), so the data-parallel paths of the CLI scripts can be
exercised on a laptop: ``PTBXL_TPU_PLATFORM=cpu PTBXL_TPU_HOST_DEVICES=8
python scripts/03_train_ecg_baseline.py ...`` trains over an 8-way mesh.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    n = os.environ.get("PTBXL_TPU_HOST_DEVICES")
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={int(n)}"
            ).strip()
    plat = os.environ.get("PTBXL_TPU_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
