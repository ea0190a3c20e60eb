"""Multi-host (DCN) bootstrap.

Single-host multi-chip needs no code beyond the mesh in parallel/mesh.py
(GSPMD collectives ride ICI).  For multi-host pods, JAX needs a one-time
process-group initialization before any backend use; this module wires it to
the standard cluster environment variables and is a no-op on a single host.

Usage (before building meshes):

    from ptbxl_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

After initialization, jax.devices() spans the pod; the ('data','model') mesh
and every jitted step in this framework work unchanged — batches must then be
fed per-host via jax.make_array_from_process_local_data with the same
NamedSharding the single-host path uses.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a cluster env is present; else no-op.

    Recognizes explicit args, the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID variables, or — with
    ``PTBXL_TPU_DISTRIBUTED=1`` — a cluster environment where
    ``jax.distributed.initialize()`` auto-detects everything (TPU pods, GKE).
    The auto-detect path is opt-in: calling initialize() unconditionally on
    a plain single host raises/hangs, so absent any of the above this is a
    no-op and the job stays single-host.

    Returns True if distributed mode was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_str = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )

    if coordinator_address is None and num_processes is None:
        # strict truthiness: '=1' per the docstring contract — 'false'/'no'
        # must NOT trigger initialize() (it can hang on a single host)
        if os.environ.get("PTBXL_TPU_DISTRIBUTED", "").strip().lower() in (
            "1", "true", "yes",
        ):
            jax.distributed.initialize()  # cluster auto-detection
            return True
        return False  # single host; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
