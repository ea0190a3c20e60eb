"""Config loading and the reference's fallback quirks."""

import os

import pytest

from ptbxl_tpu import config as C


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_multimodal_falls_back_to_ecg_demo(tmp_path):
    path = _write(
        tmp_path,
        """
model:
  ecg_demo:
    ecg_feat_dim: 128
""",
    )
    cfg = C.load_config(path)
    mc = C.model_cfg_multimodal(cfg)
    assert mc["ecg_feat_dim"] == 128


def test_demo_hidden_dim_falls_back_to_demo_feat_dim():
    assert C.multimodal_hidden_dim({"demo_feat_dim": 32}) == 32
    assert C.multimodal_hidden_dim({"demo_hidden_dim": 48, "demo_feat_dim": 32}) == 48
    assert C.multimodal_hidden_dim({}) == 64


def test_base_dir_env_override(tmp_path, monkeypatch):
    path = _write(tmp_path, "data:\n  base_dir: C:\\nope\\windows\\path\n")
    cfg = C.load_config(path)
    monkeypatch.setenv("PTBXL_BASE_DIR", "/tmp/somewhere")
    assert C.get_base_dir(cfg) == "/tmp/somewhere"
    monkeypatch.delenv("PTBXL_BASE_DIR")
    assert "windows" in C.get_base_dir(cfg)


def test_defaults(tmp_path):
    path = _write(tmp_path, "data: {}\n")
    cfg = C.load_config(path)
    assert C.get_classes(cfg) == ["MI", "STTC", "HYP", "CD", "NORM"]
    assert C.get_seed(cfg) == 42
    assert C.get_normalize(cfg) == "per_lead"


def test_reference_config_files_parse():
    # our checked-in configs mirror the reference schema
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("ecg_baseline", "ecg_multimodal", "af_binary", "base"):
        p = os.path.join(here, "configs", f"{name}.yaml")
        if os.path.exists(p):
            cfg = C.load_config(p)
            assert "data" in cfg


def test_dtype_from_config():
    import jax.numpy as jnp
    import pytest as _pytest

    from ptbxl_tpu.models.factory import dtype_from_config

    assert dtype_from_config("float32") is jnp.float32
    assert dtype_from_config("bfloat16") is jnp.bfloat16
    assert dtype_from_config("BF16") is jnp.bfloat16
    with _pytest.raises(ValueError, match="train.dtype"):
        dtype_from_config("fp8")


def test_host_devices_env(tmp_path):
    """PTBXL_TPU_HOST_DEVICES exposes N virtual CPU devices for the CLIs."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update(PTBXL_TPU_PLATFORM="cpu", PTBXL_TPU_HOST_DEVICES="4")
    out = subprocess.run(
        [sys.executable, "-c",
         "from ptbxl_tpu.utils.platform import apply_platform_env;"
         "apply_platform_env();"
         "import jax; print(len(jax.devices()), jax.devices()[0].platform)"],
        env=env, capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.split()[-2:] == ["4", "cpu"]
