"""One-step training parity vs torch: same weights, same batch, same update.

Builds the reference architecture in torch (Conv1d k=15 pad=7 -> BatchNorm ->
ReLU -> MaxPool2 x4, GAP, proj, head — reference: src/models/ecg_cnn.py),
loads IDENTICAL weights into both frameworks, runs ONE AdamW step on an
identical batch, and compares the updated parameters.  This pins the loss,
gradient, and optimizer semantics end-to-end (SURVEY §7 "hard parts").

Known intentional deviation: torch updates BatchNorm running_var with the
unbiased batch variance, flax with the biased one — a factor n/(n-1) over
n = B*T elements; asserted loose.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from ptbxl_tpu.models.factory import build_ecgcnn  # noqa: E402
from ptbxl_tpu.models.params_io import flax_to_torch_ecgcnn, torch_to_flax_ecgcnn  # noqa: E402
from ptbxl_tpu.training.loop import make_train_step  # noqa: E402
from ptbxl_tpu.training.train_state import create_train_state, make_optimizer  # noqa: E402

B, T, LABELS = 16, 256, 5
LR, WD = 1e-3, 1e-4


def _torch_model():
    """Reference-shaped ECGCNN in torch, built from its published spec."""

    class Block(tnn.Module):
        """Named 'net' so state-dict keys match the reference layout
        (backbone.{i}.net.{0,1}.*)."""

        def __init__(self, cin, cout):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv1d(cin, cout, kernel_size=15, padding=7),
                tnn.BatchNorm1d(cout),
                tnn.ReLU(),
                tnn.MaxPool1d(2),
            )

        def forward(self, x):
            return self.net(x)

    block = Block

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tnn.Sequential(block(12, 32), block(32, 64), block(64, 128), block(128, 256))
            self.gap = tnn.AdaptiveAvgPool1d(1)
            self.proj = tnn.Linear(256, 256)
            self.head = tnn.Linear(256, LABELS)

        def forward(self, x):
            h = self.backbone(x)
            z = self.proj(self.gap(h).squeeze(-1))
            return self.head(z)

    return Net()


@pytest.mark.slow
def test_one_adamw_step_matches_torch():
    # dedicated rng: with the shared session fixture, adding tests elsewhere
    # shifts this test's data, and on unlucky draws a near-zero-gradient
    # coordinate turns Adam's float noise into an O(lr) param delta (the
    # documented conv-bias effect, but on a weight) — pin the data instead
    rng = np.random.default_rng(20240817)
    # identical weights in both frameworks
    model, variables = build_ecgcnn(num_labels=LABELS, seed=0)
    state_dict = flax_to_torch_ecgcnn(jax.device_get(variables))
    tm = _torch_model()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()})
    tm.train()

    x = rng.standard_normal((B, T, 12)).astype(np.float32)
    y = (rng.uniform(size=(B, LABELS)) > 0.7).astype(np.float32)

    # --- torch step ---
    opt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    opt.zero_grad()
    logits_t = tm(torch.from_numpy(x.transpose(0, 2, 1).copy()))
    loss_t = F.binary_cross_entropy_with_logits(logits_t, torch.from_numpy(y))
    loss_t.backward()
    opt.step()
    new_torch = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    # --- jax step (normalize='none': feed the same raw batch) ---
    tx = make_optimizer(LR, WD)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, normalize="none", donate=False)
    batch = {"ecg": x, "y": y, "mask": np.ones(B, np.float32)}
    state, loss_j = step(state, batch)

    # rtol headroom over pure float noise: the persistent XLA:CPU compile
    # cache can serve binaries with different reduction orders run-to-run
    # (see the 50-step test's docstring); a semantics bug shows up ~1e-2+
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    new_jax = flax_to_torch_ecgcnn(
        {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}
    )

    for k in new_torch:
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("net.0.bias"):
            # conv bias feeds straight into train-mode BatchNorm, which
            # subtracts the batch mean: its true gradient is ~0, so Adam
            # normalizes pure float noise into an arbitrary-direction step.
            # Only the step-size bound is meaningful.
            delta = np.abs(new_jax[k] - state_dict[k])
            assert np.all(delta <= 1.5 * LR), k
            continue
        if k.endswith("running_var"):
            # biased vs unbiased batch variance in the running update
            np.testing.assert_allclose(new_jax[k], new_torch[k], rtol=5e-3, atol=1e-5, err_msg=k)
        elif k.endswith("running_mean"):
            np.testing.assert_allclose(new_jax[k], new_torch[k], rtol=1e-4, atol=1e-6, err_msg=k)
        else:
            # parameters after one AdamW step: tight agreement (atol covers
            # isolated near-zero-gradient weights where Adam amplifies noise;
            # 2e-4 is 5x below the lr=1e-3 step size, and reduction-order
            # variance between cached XLA:CPU binaries sits well under it)
            np.testing.assert_allclose(new_jax[k], new_torch[k], rtol=5e-4, atol=2e-4, err_msg=k)


@pytest.mark.slow
def test_fifty_step_trajectory_matches_torch():
    rng = np.random.default_rng(50_20240817)  # pinned: see one-step test
    """50 AdamW steps on fresh batches: the trajectories must stay locked.

    Pins what the one-step test cannot: AdamW moment accumulation, BN
    running-stat tracking, and loss/grad parity compounding over a real
    trajectory (reference loop: src/training/loop.py:14-38,
    scripts/03_train_ecg_baseline.py:143-163).

    Tolerances are set by the BN gauge structure, not wishful thinking:
    every conv layer followed by train-mode BatchNorm has null directions
    (its bias, and the overall scale of its filters) along which the loss
    gradient is pure float noise; Adam normalizes that noise into O(lr)
    steps whose direction differs between frameworks (conv reduction order
    differs), so those modes random-walk apart.  Deep-layer running stats
    live partly in this gauge (measured: ~20% running_var drift at layer 3
    after 50 steps) while every gauge-INVARIANT quantity stays tight:
    per-step losses (<=5e-3 rel for all 50 steps, measured <=2e-3), eval-mode
    probabilities (measured max ~9e-3-1.7e-2 depending on which XLA:CPU
    binary the persistent compile cache serves — reduction order changes the
    chaos realization), and layer-0 statistics once its own bias null-mode
    is differenced out.  A real semantics bug (wrong BN momentum/eps, wrong
    AdamW coupling) diverges orders of magnitude past these bounds.
    """
    n_steps = 50
    model, variables = build_ecgcnn(num_labels=LABELS, seed=0)
    state_dict = flax_to_torch_ecgcnn(jax.device_get(variables))
    tm = _torch_model()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()})
    tm.train()
    opt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)

    tx = make_optimizer(LR, WD)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, normalize="none", donate=False)

    # mildly structured inputs so gradients are non-degenerate
    base = rng.standard_normal((B, T, 12)).astype(np.float32)
    for i in range(n_steps):
        x = (base * (1.0 + 0.1 * np.sin(i + 1))
             + 0.3 * rng.standard_normal((B, T, 12))).astype(np.float32)
        y = (rng.uniform(size=(B, LABELS)) > 0.6).astype(np.float32)

        opt.zero_grad()
        loss_t = F.binary_cross_entropy_with_logits(
            tm(torch.from_numpy(x.transpose(0, 2, 1).copy())), torch.from_numpy(y)
        )
        loss_t.backward()
        opt.step()

        state, loss_j = step(state, {"ecg": x, "y": y, "mask": np.ones(B, np.float32)})
        # trajectory-level loss agreement at every step (loose: f32 conv
        # reductions differ between backends and compound)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=5e-3,
                                   err_msg=f"step {i}")

    # --- BN running stats after 50 updates ---
    new_jax = flax_to_torch_ecgcnn(
        {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}
    )
    new_torch = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    # layer 0 sees fixed inputs, so its stats are gauge-anchored except its
    # own conv-bias null mode; difference that out and compare tight
    rm, bias = "backbone.0.net.1.running_mean", "backbone.0.net.0.bias"
    np.testing.assert_allclose(
        new_jax[rm] - new_jax[bias], new_torch[rm] - new_torch[bias], atol=2e-3
    )
    rv = "backbone.0.net.1.running_var"
    np.testing.assert_allclose(new_jax[rv], new_torch[rv], rtol=1e-2)
    # deeper layers: the gauge drift must stay bounded (a semantics bug such
    # as a wrong momentum or eps shows up orders of magnitude above this)
    for li in range(1, 4):
        k = f"backbone.{li}.net.1.running_var"
        np.testing.assert_allclose(new_jax[k], new_torch[k], rtol=0.5, err_msg=k)

    # --- eval-mode probabilities on a held-out batch (gauge-invariant) ---
    x_eval = rng.standard_normal((B, T, 12)).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        probs_t = torch.sigmoid(tm(torch.from_numpy(x_eval.transpose(0, 2, 1).copy()))).numpy()

    @jax.jit
    def eval_probs(variables, x):
        return jax.nn.sigmoid(model.apply(variables, x, False))

    probs_j = np.asarray(eval_probs(state.variables(), jnp.asarray(x_eval)))
    np.testing.assert_allclose(probs_j, probs_t, atol=4e-2)
    assert float(np.abs(probs_j - probs_t).mean()) < 2e-2
