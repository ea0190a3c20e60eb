"""Jitted train/eval steps and host epoch loops.

Capability parity with reference src/training/loop.py (single-input) and
loop_demo.py (two-input), rebuilt TPU-first:

* ONE jitted ``train_step`` per task: fused on-device z-score preprocessing,
  forward with mutable batch_stats, masked BCE-with-logits, AdamW update.
  Under a data-sharded batch + GSPMD, gradient reduction and global-batch BN
  statistics compile to psum/all-reduce over ICI automatically.
* the final padded batch is masked out of loss and metrics (the reference ran
  ragged batches; see data/pipeline.py)
* two epoch-loss aggregation modes, preserving a reference quirk:
  'per_sample' — dataset-weighted mean (loop.py:36-38) for baseline/AF;
  'per_batch'  — unweighted mean of batch losses (loop_demo.py:40-43) for the
  multimodal task
* eval gathers sigmoid probs to host and computes sklearn metrics, exactly
  like the reference (loop.py:41-73)
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch
from ptbxl_tpu.training.metrics import compute_metrics
from ptbxl_tpu.training.train_state import TrainState


def _model_inputs(batch: Dict, x: jnp.ndarray, multimodal: bool):
    return (x, batch["demo"]) if multimodal else (x,)


def _per_sample_bce(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-labels BCE per sample [B] (== torch BCEWithLogitsLoss row mean)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y), axis=-1)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    multimodal: bool = False,
    normalize: str = "per_lead",
    donate: bool = True,
) -> Callable[[TrainState, Dict], Tuple[TrainState, jnp.ndarray]]:
    """Build the jitted training step.

    ``donate=True`` donates the state buffers (in-place update on device);
    callers that keep aliases to the initial variables (tests) pass False.
    """

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, jnp.ndarray]:
        x = batch["ecg"]
        if normalize == "per_lead":
            x = zscore_per_lead_batch(x)
        mask = batch["mask"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = model.apply(
                variables, *_model_inputs(batch, x, multimodal), True,
                mutable=["batch_stats"],
            )
            per_sample = _per_sample_bce(logits, batch["y"])
            loss = jnp.sum(per_sample * mask) / jnp.sum(mask)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model, multimodal: bool = False, normalize: str = "per_lead"
) -> Callable[[TrainState, Dict], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Jitted eval step -> (probs [B, L], per-sample loss [B])."""

    def step(state: TrainState, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = batch["ecg"]
        if normalize == "per_lead":
            x = zscore_per_lead_batch(x)
        logits = model.apply(
            state.variables(), *_model_inputs(batch, x, multimodal), False
        )
        # always f32 at the boundary: host metrics (sklearn) and CSV writers
        # consume these even when the model computes in bf16
        logits = logits.astype(jnp.float32)
        return jax.nn.sigmoid(logits), _per_sample_bce(logits, batch["y"])

    return jax.jit(step)


def _maybe_tqdm(batches: Iterator[Dict], desc: Optional[str]):
    if desc is None:
        return batches
    try:
        from tqdm import tqdm

        return tqdm(batches, desc=desc, leave=False)
    except ImportError:
        return batches


def train_one_epoch(
    state: TrainState,
    train_step: Callable,
    batches: Iterator[Dict],
    loss_mode: str = "per_sample",
    desc: Optional[str] = None,
) -> Tuple[TrainState, float]:
    """Run one epoch; returns (state, epoch train loss in the reference's
    aggregation mode)."""
    from ptbxl_tpu.utils.profiling import StepTimer, perf_enabled

    timer = StepTimer() if perf_enabled() else None
    total = 0.0
    weight = 0.0
    pending = None  # (loss future, n_real) — materialized one step late so
    # the next step is already dispatched while this one runs (async dispatch)

    def settle(item):
        nonlocal total, weight
        loss, n_real = float(item[0]), item[1]
        if loss_mode == "per_sample":
            total += loss * n_real
            weight += n_real
        else:  # per_batch (loop_demo.py:40-43)
            total += loss
            weight += 1.0

    for batch in _maybe_tqdm(batches, desc):
        n_real = float(np.asarray(batch["mask"]).sum())
        if timer:  # timer mode: block per step for honest timing
            timer.start()
        state, loss = train_step(state, batch)
        if timer:
            settle((loss, n_real))  # float() blocks on the step
            timer.stop(n_real)
        else:
            if pending is not None:
                settle(pending)
            pending = (loss, n_real)
    if pending is not None:
        settle(pending)
    if timer:
        print(timer.report("train"))
    return state, total / max(1.0, weight)


def eval_one_epoch(
    state: TrainState,
    eval_step: Callable,
    batches: Iterator[Dict],
    threshold: float = 0.5,
    loss_mode: str = "per_sample",
    desc: Optional[str] = None,
) -> Dict[str, float]:
    """Eval epoch -> metrics dict {auroc_macro, auprc_macro, f1_macro, bce_loss}."""
    probs_list, y_list = [], []
    total = 0.0
    weight = 0.0
    for batch in _maybe_tqdm(batches, desc):
        probs, per_sample = eval_step(state, batch)
        mask = np.asarray(batch["mask"]).astype(bool)
        probs = np.asarray(probs)[mask]
        y = np.asarray(batch["y"])[mask]
        losses = np.asarray(per_sample)[mask]
        probs_list.append(probs)
        y_list.append(y)
        if loss_mode == "per_sample":
            total += float(losses.sum())
            weight += float(mask.sum())
        elif mask.any():
            total += float(losses.mean())
            weight += 1.0
        # an all-padding batch contributes NO per_batch weight: counting it as
        # a 0.0-loss batch would silently bias the multimodal val loss down

    if not y_list:
        raise ValueError(
            "eval split produced no batches (every record dropped?) — "
            "check the dataset's validity/demographic filters"
        )
    y_true = np.concatenate(y_list, axis=0)
    y_prob = np.concatenate(probs_list, axis=0)
    metrics = compute_metrics(y_true, y_prob, threshold=threshold)
    metrics["bce_loss"] = total / max(1.0, weight)
    return metrics


def predict_all(
    state: TrainState,
    eval_step: Callable,
    batches: Iterator[Dict],
    loss_mode: str = "per_sample",
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Full-split inference -> (y_true, y_prob, mean bce loss).

    Used by the test scripts 06/07/08 to dump per-sample prediction CSVs.
    ``loss_mode`` matches the epoch loops: 'per_sample' is the dataset mean
    (scripts 06/08); 'per_batch' is the unweighted mean of batch means — the
    multimodal quirk (reference: scripts/07:94-106 via loop_demo.py:40-43).
    """
    probs_list, y_list, losses, batch_means = [], [], [], []
    for batch in batches:
        probs, per_sample = eval_step(state, batch)
        mask = np.asarray(batch["mask"]).astype(bool)
        probs_list.append(np.asarray(probs)[mask])
        y_list.append(np.asarray(batch["y"])[mask])
        kept = np.asarray(per_sample)[mask]
        losses.append(kept)
        if mask.any():
            batch_means.append(float(kept.mean()))
    if not y_list:
        raise ValueError(
            "test split produced no batches (every record dropped?) — "
            "check the dataset's validity/demographic filters"
        )
    y_true = np.concatenate(y_list, axis=0)
    y_prob = np.concatenate(probs_list, axis=0)
    if loss_mode == "per_batch":
        loss = float(np.mean(batch_means)) if batch_means else 0.0
    else:
        loss = float(np.concatenate(losses, axis=0).mean())
    return y_true, y_prob, loss
