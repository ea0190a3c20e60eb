"""Checkpoint conversion and native format round-trips."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.models import ECGCNN, ECGMultimodal  # noqa: E402
from ptbxl_tpu.models.params_io import (  # noqa: E402
    _read_pth_pure_python,
    flax_to_torch_ecgcnn,
    load_npz,
    read_pth,
    save_npz,
    torch_to_flax_backbone,
    torch_to_flax_ecgcnn,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _init_ecgcnn(num_labels=5):
    m = ECGCNN(feat_dim=256, num_labels=num_labels)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 12)))
    return m, v


def test_npz_roundtrip(tmp_path):
    _, v = _init_ecgcnn()
    p = str(tmp_path / "ck.npz")
    save_npz(p, v, classes=["A", "B"])
    v2, classes = load_npz(p)
    assert classes == ["A", "B"]
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from ptbxl_tpu.models.params_io import export_pth

    _, v = _init_ecgcnn()
    p = str(tmp_path / "ck.pth")
    export_pth(p, v, arch="ecgcnn", classes=["MI"])
    ck = read_pth(p)
    assert ck["classes"] == ["MI"]
    v2 = torch_to_flax_ecgcnn(ck["model_state"])
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_pure_python_pth_reader(tmp_path):
    """The torch-free .pth reader must agree with torch.load."""
    torch = pytest.importorskip("torch")
    from ptbxl_tpu.models.params_io import export_pth

    _, v = _init_ecgcnn()
    p = str(tmp_path / "ck.pth")
    export_pth(p, v, arch="ecgcnn", classes=["MI", "CD"])

    obj = _read_pth_pure_python(p)
    assert obj["classes"] == ["MI", "CD"]
    ref = torch.load(p, map_location="cpu")
    for k, tv in ref["model_state"].items():
        np.testing.assert_array_equal(obj["model_state"][k], tv.numpy())


def test_backbone_warm_start_drops_head():
    """strict=False semantics of the multimodal warm start (reference 04:149-156)."""
    _, v = _init_ecgcnn()
    state = flax_to_torch_ecgcnn(v)
    bb = torch_to_flax_backbone(state)
    assert "head" not in bb["params"]
    assert "proj" in bb["params"]
    assert set(bb["params"].keys()) == {"blocks_0", "blocks_1", "blocks_2", "blocks_3", "proj"}


def test_load_checkpoint_dispatch(tmp_path):
    from ptbxl_tpu.models.params_io import load_checkpoint

    _, v = _init_ecgcnn()
    p = str(tmp_path / "ck.npz")
    save_npz(p, v, classes=["X"])
    v2, classes = load_checkpoint(p, arch="ecgcnn")
    assert classes == ["X"]
