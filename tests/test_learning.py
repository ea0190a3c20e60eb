"""Learnability: the full training stack must fit a learnable synthetic task.

PTB-XL itself is not bundled, so AUROC parity on real data cannot be measured
here (inference parity via converted weights covers that — docs/PARITY.md).
This test instead verifies the optimization stack end-to-end: on a synthetic
binary task where the label is encoded in the waveform (fast vs slow beat
rate, the same cue an AF detector uses), a few epochs must reach high AUROC.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ptbxl_tpu.data.pipeline import device_prefetch  # noqa: E402
from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.training.loop import (  # noqa: E402
    eval_one_epoch,
    make_eval_step,
    make_train_step,
    train_one_epoch,
)
from ptbxl_tpu.training.train_state import (  # noqa: E402
    create_train_state,
    large_batch_lr,
    make_optimizer,
)

T = 512
FS = 500.0


class _SyntheticBeats:
    """In-memory dataset: y=1 <-> fast beat rate (AF-like), y=0 <-> slow."""

    def __init__(self, n, seed):
        rng = np.random.default_rng(seed)
        self.y = (rng.uniform(size=(n, 1)) > 0.5).astype(np.float32)
        t = np.arange(T) / FS
        xs = []
        for i in range(n):
            hr = rng.uniform(2.5, 3.5) if self.y[i, 0] > 0 else rng.uniform(0.8, 1.5)
            phase = rng.uniform(0, 6)
            beat = np.sin(2 * np.pi * hr * t + phase) ** 9
            leads = [
                rng.uniform(0.5, 1.5) * beat + 0.05 * rng.standard_normal(T)
                for _ in range(12)
            ]
            xs.append(np.stack(leads, axis=0))
        self.x = np.stack(xs).astype(np.float32)  # [n, 12, T]

    def __len__(self):
        return len(self.x)


class _ArraySource:
    """Minimal BatchSource-compatible epoch iterator over in-memory arrays."""

    def __init__(self, ds, batch_size, shuffle, seed=0):
        self.ds, self.bs, self.shuffle, self.seed = ds, batch_size, shuffle, seed

    def epoch(self, e=0):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + e).shuffle(order)
        for s in range(0, n, self.bs):
            idx = order[s : s + self.bs]
            real = len(idx)
            if real < self.bs:
                idx = np.concatenate([idx, np.repeat(idx[-1:], self.bs - real)])
            yield {
                "ecg": self.ds.x[idx].transpose(0, 2, 1).copy(),
                "y": self.ds.y[idx],
                "mask": (np.arange(self.bs) < real).astype(np.float32),
            }


@pytest.mark.slow
@pytest.mark.parametrize(
    "precision,dtype",
    [
        ("highest", "float32"),  # f32 parity path (train.precision: highest)
        (None, "bfloat16"),      # quality gate for the bf16 perf path: bf16
        # activations are strictly LESS precise than the TPU default-precision
        # MXU path (which only reduces matmul inputs), so passing here bounds
        # the advertised `train.precision: default` throughput config
    ],
    ids=["f32-parity", "bf16"],
)
def test_training_learns_af_like_task(precision, dtype):
    import jax.numpy as jnp

    train_ds = _SyntheticBeats(192, seed=0)
    val_ds = _SyntheticBeats(64, seed=1)

    model, variables = build_ecgcnn(
        num_labels=1, seed=0, precision=precision, dtype=getattr(jnp, dtype)
    )
    tx = make_optimizer(1e-3, 1e-4)
    state = create_train_state(model, variables, tx)
    train_step = make_train_step(model, tx, donate=False)
    eval_step = make_eval_step(model)

    train_src = _ArraySource(train_ds, 16, True)
    val_src = _ArraySource(val_ds, 16, False)

    first_metrics = eval_one_epoch(state, eval_step, val_src.epoch(0))
    losses = []
    for epoch in range(6):
        state, loss = train_one_epoch(state, train_step, train_src.epoch(epoch))
        losses.append(loss)
    final_metrics = eval_one_epoch(state, eval_step, val_src.epoch(0))

    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses}"
    assert final_metrics["auroc_macro"] > 0.9, (
        f"AUROC {final_metrics['auroc_macro']:.3f} after training "
        f"(untrained: {first_metrics['auroc_macro']:.3f})"
    )
    assert final_metrics["auroc_macro"] > first_metrics["auroc_macro"]


@pytest.mark.slow
def test_large_batch_recipe_learns():
    """Convergence gate for the large-batch recipe (linear LR scaling +
    warmup, train_state.large_batch_lr): 6x the reference batch with the
    scaled LR must still learn the task.  This is the quality gate behind
    the bench's large-batch training rows and the train.lr_scaling /
    train.warmup_steps config keys."""
    train_ds = _SyntheticBeats(192, seed=0)
    val_ds = _SyntheticBeats(64, seed=1)

    model, variables = build_ecgcnn(num_labels=1, seed=0)
    bs = 64  # 4x the small-batch test's 16
    lr = large_batch_lr(1e-3, bs, ref_batch_size=16)
    tx = make_optimizer(lr, 1e-4, warmup_steps=8)
    state = create_train_state(model, variables, tx)
    train_step = make_train_step(model, tx, donate=False)
    eval_step = make_eval_step(model)

    train_src = _ArraySource(train_ds, bs, True)
    val_src = _ArraySource(val_ds, bs, False)

    # 12 epochs = 36 steps: BN running stats (momentum 0.9) need tens of
    # steps to track the trained batch statistics — at <~25 total steps the
    # train loss reaches ~0 while EVAL-mode AUROC is still 0.5 (measured;
    # the caveat is documented with the recipe in docs/ARCHITECTURE.md)
    losses = []
    for epoch in range(12):
        state, loss = train_one_epoch(state, train_step, train_src.epoch(epoch))
        losses.append(loss)
    final_metrics = eval_one_epoch(state, eval_step, val_src.epoch(0))

    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses}"
    assert final_metrics["auroc_macro"] > 0.9, (
        f"large-batch AUROC {final_metrics['auroc_macro']:.3f}"
    )
