"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment.  Each process owns 2
virtual CPU devices (4 global), initializes the process group through
ptbxl_tpu.parallel.multihost, feeds its process-local batch shard through
``jax.make_array_from_process_local_data``, and runs ONE real train step on
the global ('data','model') mesh.  Prints ``RESULT pid=<i> loss=<v>`` —
the parent asserts both processes report the same finite global loss.
"""

import os
import sys

# exactly 2 local devices per process (override the suite's 8)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ptbxl_tpu.parallel.multihost import maybe_initialize_distributed  # noqa: E402

if not maybe_initialize_distributed():
    print("RESULT pid=? loss=nan (distributed init skipped)", flush=True)
    sys.exit(2)

import numpy as np  # noqa: E402

from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding  # noqa: E402
from ptbxl_tpu.training.loop import make_train_step  # noqa: E402
from ptbxl_tpu.training.train_state import create_train_state, make_optimizer  # noqa: E402


def main() -> None:
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4

    pid = jax.process_index()
    mesh = make_mesh(n_model=1)  # 4 x 1 over the global device set
    sharding = batch_sharding(mesh)

    model, variables = build_ecgcnn(num_labels=5, seed=0)
    tx = make_optimizer(1e-3, 1e-4)
    state = create_train_state(model, variables, tx)
    # params/opt state replicated over the global mesh (identical on every
    # process by construction: same seed)
    state = jax.device_put(state, replicated_sharding(mesh))

    # Deterministic GLOBAL batch; each process supplies only its local half.
    rng = np.random.default_rng(42)
    g = 8
    ecg = rng.standard_normal((g, 64, 12)).astype(np.float32)
    y = (rng.uniform(size=(g, 5)) > 0.5).astype(np.float32)
    lo, hi = pid * (g // 2), (pid + 1) * (g // 2)
    batch = {
        "ecg": jax.make_array_from_process_local_data(sharding, ecg[lo:hi], (g, 64, 12)),
        "y": jax.make_array_from_process_local_data(sharding, y[lo:hi], (g, 5)),
        "mask": jax.make_array_from_process_local_data(
            sharding, np.ones(g // 2, np.float32), (g,)
        ),
    }

    step = make_train_step(model, tx, donate=False)
    state, loss = step(state, batch)
    print(f"RESULT pid={pid} loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
