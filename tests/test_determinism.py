"""Run-to-run determinism of the full training stack."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ptbxl_tpu.data import PTBXLDataset  # noqa: E402
from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.training.loop import make_train_step, train_one_epoch  # noqa: E402
from ptbxl_tpu.training.train_state import create_train_state, make_optimizer  # noqa: E402

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def _one_epoch(ptbxl_dir, seed):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    model, variables = build_ecgcnn(num_labels=5, seed=seed)
    tx = make_optimizer(1e-3, 1e-4)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False)
    src = BatchSource(ds, 8, shuffle=True, seed=seed)
    state, loss = train_one_epoch(state, step, device_prefetch(src.epoch(0)))
    return loss, jax.device_get(state.params)["head"]["kernel"]


@pytest.mark.slow
def test_identical_seeds_identical_training(ptbxl_dir):
    loss1, params1 = _one_epoch(ptbxl_dir, seed=3)
    loss2, params2 = _one_epoch(ptbxl_dir, seed=3)
    assert loss1 == loss2
    np.testing.assert_array_equal(params1, params2)


@pytest.mark.slow
def test_different_seeds_differ(ptbxl_dir):
    loss1, _ = _one_epoch(ptbxl_dir, seed=3)
    loss2, _ = _one_epoch(ptbxl_dir, seed=4)
    assert loss1 != loss2
