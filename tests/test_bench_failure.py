"""bench.py driver-contract tests (round-3 verdict item 1).

BENCH_r03.json recorded rc=1 with ``parsed: null`` because a transient TPU
backend-init error propagated as a raw traceback.  The contract now is:
bench.py ALWAYS prints exactly one parseable JSON line and exits 0, even
when the backend is unreachable — on failure the line carries
``value: null`` plus an ``error`` string the driver can record.

These tests run bench.py as a subprocess with a deliberately broken backend
(fast retries via the env knobs) and assert the structured-failure contract.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, extra_env):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "PTBXL_TPU_BENCH_RETRIES": "2",
        "PTBXL_TPU_BENCH_RETRY_DELAY": "0.05",
        # keep the probe but bound it tightly; a bad platform fails fast
        "PTBXL_TPU_BENCH_PROBE_TIMEOUT": "120",
        # never let a test-suite bench signal a genuinely running bench
        "PTBXL_TPU_BENCH_PREFLIGHT_KILL": "0",
    })
    env.update(extra_env)
    out = str(tmp_path / "bench_results.json")
    r = subprocess.run(
        [sys.executable, BENCH, "--out", out],
        # generous: several jax imports (probe subprocesses + main) can take
        # minutes each when the box is contended (1 CPU core)
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    return r, out


@pytest.mark.slow
def test_backend_failure_emits_structured_json_line(tmp_path):
    r, out = _run_bench(tmp_path, {"PTBXL_TPU_PLATFORM": "definitely_not_a_backend"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines}"
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "ecg_inference_records_per_sec_per_chip"
    assert parsed["value"] is None
    assert parsed["vs_baseline"] is None
    assert "error" in parsed and parsed["error"]
    # the sidecar is still written, with the same headline + error
    with open(out) as f:
        suite = json.load(f)
    assert suite["headline"]["value"] is None
    assert suite["headline"]["error"] == parsed["error"]


def test_acquire_backend_retries_then_raises(monkeypatch):
    """Unit-level: _acquire_backend retries with clear_backends between
    attempts and raises a RuntimeError naming the attempt count."""
    sys.path.insert(0, REPO)
    import bench

    calls = {"n": 0}

    def fail_probe(timeout_s):
        calls["n"] += 1
        return None, "synthetic backend failure"

    monkeypatch.setenv("PTBXL_TPU_BENCH_RETRIES", "3")
    monkeypatch.setenv("PTBXL_TPU_BENCH_RETRY_DELAY", "0.0")
    monkeypatch.setenv("PTBXL_TPU_BENCH_PROBE_TIMEOUT", "1")
    monkeypatch.setattr(bench, "_probe_backend_subprocess", fail_probe)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        bench._acquire_backend()
    assert calls["n"] == 3


def test_acquire_backend_success_path(monkeypatch):
    """With a healthy (CPU) backend the acquisition returns on attempt 1."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("PTBXL_TPU_BENCH_PROBE_TIMEOUT", "0")  # in-process only
    backend, device, attempts = bench._acquire_backend()
    assert backend == "cpu"  # conftest forces the CPU backend
    assert attempts == 1


def test_preflight_never_touches_foreign_pids(tmp_path, monkeypatch):
    """A pidfile pointing at a live non-bench process must be left alone."""
    sys.path.insert(0, REPO)
    import tempfile

    import bench

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    # a live process that is definitely not bench.py: our own pytest parent
    foreign = os.getppid() or 1
    with open(tmp_path / "ptbxl_tpu_bench.pid", "w") as f:
        f.write(str(foreign))
    notes = bench._preflight_chip()
    assert any("left alone" in n for n in notes if str(foreign) in n) or all(
        "terminating" not in n for n in notes
    )
    # and the pidfile now holds our own pid (+ start-time identity token)
    with open(tmp_path / "ptbxl_tpu_bench.pid") as f:
        rec = f.read().split()
    assert int(rec[0]) == os.getpid()
    assert len(rec) == 2 and rec[1] == bench._proc_starttime(os.getpid())


def test_preflight_recovers_from_corrupt_pidfile(tmp_path, monkeypatch):
    """A torn/garbage pidfile must not abort the preflight: it is treated as
    no stale pid and OVERWRITTEN by self-registration, so one bad write can
    never permanently disable the stale-bench protection."""
    import tempfile

    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    pidfile = tmp_path / "ptbxl_tpu_bench.pid"
    with open(pidfile, "w") as f:
        f.write("not-a-pid garbage\x00")
    notes = bench._preflight_chip()
    assert not any("preflight skipped" in n for n in notes)
    with open(pidfile) as f:
        rec = f.read().split()
    assert int(rec[0]) == os.getpid()
    assert rec[1] == bench._proc_starttime(os.getpid())


def test_preflight_kill_is_identity_checked_and_gated(tmp_path, monkeypatch):
    """The stale-bench kill fires only on PID + kernel-start-time match with
    a bench.py cmdline, and PTBXL_TPU_BENCH_PREFLIGHT_KILL=0 disables it."""
    import signal
    import tempfile

    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    pidfile = tmp_path / "ptbxl_tpu_bench.pid"

    def spawn_fake_bench():
        # argv carries the 'bench.py' marker so /proc cmdline matches;
        # wait for execve to land (pre-exec the child still shows the
        # parent's cmdline — a real race observed in-suite)
        import time

        p = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(120)", "bench.py"])
        for _ in range(200):
            try:
                with open(f"/proc/{p.pid}/cmdline", "rb") as f:
                    if b"bench.py" in f.read():
                        break
            except OSError:
                pass
            time.sleep(0.05)
        return p

    # (a) kill disabled: the recorded process survives
    p = spawn_fake_bench()
    try:
        with open(pidfile, "w") as f:
            f.write(f"{p.pid} {bench._proc_starttime(p.pid)}")
        monkeypatch.setenv("PTBXL_TPU_BENCH_PREFLIGHT_KILL", "0")
        notes = bench._preflight_chip()
        assert any("kill disabled" in n for n in notes)
        assert p.poll() is None, "process was signalled despite KILL=0"
        # (b) wrong start time (recycled PID): left alone even with kill on
        monkeypatch.setenv("PTBXL_TPU_BENCH_PREFLIGHT_KILL", "1")
        with open(pidfile, "w") as f:
            f.write(f"{p.pid} 12345")
        notes = bench._preflight_chip()
        assert any("recycled" in n for n in notes)
        assert p.poll() is None
        # (c) full identity match with kill enabled: terminated
        with open(pidfile, "w") as f:
            f.write(f"{p.pid} {bench._proc_starttime(p.pid)}")
        notes = bench._preflight_chip()
        assert any("terminating" in n for n in notes)
        assert p.wait(timeout=15) == -signal.SIGTERM
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()


@pytest.mark.slow
def test_headline_success_path_smoke(tmp_path):
    """SUCCESS-path wiring check on CPU (PTBXL_TPU_BENCH_SMOKE shrinks the
    sweep): backend acquisition -> sweep -> one numeric JSON headline ->
    v2 sidecar.  Numbers under smoke are meaningless; only the contract is
    asserted."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "PTBXL_TPU_PLATFORM": "cpu",
        "PTBXL_TPU_BENCH_SMOKE": "1",
        "PTBXL_TPU_BENCH_PROBE_TIMEOUT": "0",  # CPU init is reliable
        "PTBXL_TPU_BENCH_PREFLIGHT_KILL": "0",
    })
    out = str(tmp_path / "bench_results.json")
    r = subprocess.run(
        [sys.executable, BENCH, "--out", out],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "ecg_inference_records_per_sec_per_chip"
    assert isinstance(parsed["value"], (int, float)) and parsed["value"] > 0
    assert "error" not in parsed
    with open(out) as f:
        suite = json.load(f)
    assert suite["schema"] == "ptbxl_tpu_bench_v2"
    assert suite["backend"] == "cpu"
    assert suite["backend_attempts"] == 1
    assert "mfu_model" in suite and "preflight" in suite
    rows = suite["inference"]["rows"]
    assert rows and all("tflops" in row for row in rows)
