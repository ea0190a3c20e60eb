"""2-process jax.distributed smoke test (CPU, local coordinator).

Exercises ptbxl_tpu/parallel/multihost.py for real: two OS processes, each
with 2 virtual CPU devices, form a 4-device global mesh; each feeds its local
half of a deterministic global batch via
``jax.make_array_from_process_local_data`` and runs one data-parallel train
step.  Both must report the same finite global loss (the gradient psum spans
the process boundary).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

from ptbxl_tpu.parallel.multihost import maybe_initialize_distributed

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def test_maybe_initialize_is_noop_without_cluster_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False


@pytest.mark.parametrize("value", ["0", "false", "no", "False", "NO", " "])
def test_distributed_env_falsey_values_stay_noop(monkeypatch, value):
    """PTBXL_TPU_DISTRIBUTED=false/no must NOT call jax.distributed.initialize
    (which can hang on a single host) — the contract is '=1'."""
    import jax

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("PTBXL_TPU_DISTRIBUTED", value)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    assert maybe_initialize_distributed() is False
    assert calls == []


@pytest.mark.parametrize("value", ["1", "true", "YES"])
def test_distributed_env_truthy_values_initialize(monkeypatch, value):
    import jax

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("PTBXL_TPU_DISTRIBUTED", value)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    assert maybe_initialize_distributed() is True
    assert len(calls) == 1


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\nstdout:{out}\nstderr:{err}"
        outs.append(out)

    losses = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) loss=([-\d.naninf]+)", out)
        assert m, f"no RESULT line in: {out}"
        losses[int(m.group(1))] = float(m.group(2))

    assert set(losses) == {0, 1}
    l0, l1 = losses[0], losses[1]
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert 0.0 < l0 < 10.0  # finite, sane BCE for a fresh 5-label model
