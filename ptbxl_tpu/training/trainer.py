"""High-level training engine shared by the three train CLIs (03/04/05).

Orchestrates: data-parallel mesh setup, jitted step construction, epoch loops,
per-epoch CSV logging (reference schema), best-checkpoint selection by val
macro-AUPRC (reference: scripts/03:164-168), optional early stopping
(multimodal only, scripts/04:212-216), optional encoder warm start
(scripts/04:149-156), and crash-safe resume (an improvement over the
reference, which loses a run on crash — SURVEY.md §5): the full TrainState
(params + BN stats + optimizer state + epoch/best counters) is checkpointed
with Orbax every epoch.

Best checkpoints are written in the native .npz format and, when torch is
importable, additionally exported as a reference-compatible .pth.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax

from ptbxl_tpu.data.pipeline import BatchSource, device_prefetch
from ptbxl_tpu.models.params_io import export_pth, save_npz
from ptbxl_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ptbxl_tpu.training.loop import (
    eval_one_epoch,
    make_eval_step,
    make_train_step,
    train_one_epoch,
)
from ptbxl_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from ptbxl_tpu.utils.csv_log import log_epoch_to_csv


def mesh_for_batch(batch_size: int):
    """1-D data mesh using the largest device count that divides batch_size."""
    n_dev = len(jax.devices())
    n_data = 1
    for d in range(min(n_dev, batch_size), 0, -1):
        if batch_size % d == 0:
            n_data = d
            break
    return make_mesh(n_data=n_data, n_model=1)


@dataclass
class TrainRun:
    """Everything task-specific the engine needs."""

    model: object
    variables: Dict
    train_ds: object
    val_ds: object
    batch_size: int
    epochs: int
    lr: float
    weight_decay: float
    seed: int
    run_name: str
    metrics_csv: str
    ckpt_path: str  # native .npz best checkpoint
    config_path: str
    classes: Optional[List[str]] = None  # saved into ckpt when not None
    multimodal: bool = False
    loss_mode: str = "per_sample"  # 'per_batch' for the multimodal task
    normalize: str = "per_lead"
    early_stop_patience: Optional[int] = None
    arch: str = "ecgcnn"  # for the .pth export
    train_print: str = "Train BCE"
    val_print: str = "Val metrics"
    best_print: Callable[[float, str], str] = field(
        default=lambda best, path: f"★ New best AUPRC: {best:.4f}"
    )
    resume: bool = False
    pth_export: bool = True
    # Large-batch recipe (extension; the reference has no LR schedule):
    # lr_scaling='linear' applies lr * batch_size/ref_batch_size and
    # warmup_steps ramps the LR linearly from 0 — see
    # train_state.large_batch_lr, convergence-gated by
    # tests/test_learning.py[large-batch].
    warmup_steps: int = 0
    lr_scaling: str = "none"  # 'none' | 'linear'
    ref_batch_size: int = 64
    progress: Optional[Callable[[int, float, Dict[str, float]], None]] = None
    train_desc: str = "Train"  # tqdm bar labels (reference: loop.py:22,53)
    eval_desc: str = "Eval"


def _best_meta_path(ckpt_path: str) -> str:
    return ckpt_path + ".meta.json"


def _export_best(run: TrainRun, state: TrainState, val_auprc: float):
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    save_npz(run.ckpt_path, variables, classes=run.classes)
    # sidecar records the achieved AUPRC so a crash between best-export and
    # the resume save cannot make a later, worse epoch clobber this ckpt
    try:
        import json

        tmp = _best_meta_path(run.ckpt_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"val_auprc": float(val_auprc)}, f)
        os.replace(tmp, _best_meta_path(run.ckpt_path))
    except OSError as e:
        print(f"[WARN] could not write best-ckpt sidecar: {e}")
    if run.pth_export:
        try:
            pth_path = os.path.splitext(run.ckpt_path)[0] + ".pth"
            export_pth(pth_path, variables, arch=run.arch, classes=run.classes)
        except ImportError:
            pass  # torch not installed: .npz is the native format
        except Exception as e:
            # convenience export must not kill a training run
            print(f"[WARN] .pth export failed ({e}); native .npz saved")


def _resume_dir(run: TrainRun) -> str:
    return os.path.join(os.path.dirname(run.ckpt_path), f"{run.run_name}_resume")


def train(run: TrainRun) -> TrainState:
    """Run the full training loop; returns the final TrainState."""
    import orbax.checkpoint as ocp

    if os.environ.get("PTBXL_TPU_CHECK_NUMERICS", "") not in ("", "0"):
        # fail fast on the first NaN/inf anywhere in the jitted graph
        jax.config.update("jax_debug_nans", True)

    mesh = mesh_for_batch(run.batch_size)
    b_shard = batch_sharding(mesh)
    r_shard = replicated_sharding(mesh)

    lr = run.lr
    if run.lr_scaling == "linear":
        from ptbxl_tpu.training.train_state import large_batch_lr

        lr = large_batch_lr(run.lr, run.batch_size, run.ref_batch_size)
        print(f"[INFO] Large-batch LR scaling: lr {run.lr:g} -> {lr:g} "
              f"(batch {run.batch_size} vs ref {run.ref_batch_size}, "
              f"warmup {run.warmup_steps} steps)")
    elif run.lr_scaling != "none":
        raise ValueError(f"unknown lr_scaling {run.lr_scaling!r} (none|linear)")
    tx = make_optimizer(lr, run.weight_decay, warmup_steps=run.warmup_steps)
    state = create_train_state(run.model, run.variables, tx)
    state = jax.device_put(state, r_shard)

    train_step = make_train_step(run.model, tx, run.multimodal, run.normalize)
    eval_step = make_eval_step(run.model, run.multimodal, run.normalize)

    # emit_adc ships int16 ADC and converts on device (half the H2D bytes);
    # BatchSource silently falls back to the float32 path without a cache
    train_src = BatchSource(
        run.train_ds, run.batch_size, shuffle=True, seed=run.seed, emit_adc=True
    )
    val_src = BatchSource(
        run.val_ds, run.batch_size, shuffle=False, seed=run.seed, emit_adc=True
    )

    # Opt-in TensorBoard scalars.  The reference declares `log.tb: true` but
    # never writes TensorBoard (SURVEY §5); default behavior stays dormant —
    # set PTBXL_TPU_TB=<dir> to activate.
    tb_writer = None
    tb_root = os.environ.get("PTBXL_TPU_TB")
    if tb_root:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(tb_root, run.run_name))
        except Exception as e:  # torch/tensorboard unavailable
            print(f"[WARN] TensorBoard requested but unavailable: {e}")

    start_epoch = 0
    best_auprc = -1.0
    epochs_no_improve = 0

    ckpointer = ocp.StandardCheckpointer()
    resume_dir = os.path.abspath(_resume_dir(run))
    latest = os.path.join(resume_dir, "latest")
    if run.resume and os.path.exists(latest):
        template = {
            "state": jax.device_get(state),
            "epoch": 0,
            "best_auprc": 0.0,
            "epochs_no_improve": 0,
        }
        restored = ckpointer.restore(latest, template)
        state = jax.device_put(restored["state"], r_shard)
        start_epoch = int(restored["epoch"])
        best_auprc = float(restored["best_auprc"])
        epochs_no_improve = int(restored["epochs_no_improve"])
        # reconcile with the exported best ckpt's sidecar: a crash between
        # best-export and the resume save leaves the sidecar ahead
        try:
            import json

            with open(_best_meta_path(run.ckpt_path)) as f:
                best_auprc = max(best_auprc, float(json.load(f)["val_auprc"]))
        except (OSError, ValueError, KeyError):
            pass
        print(f"[INFO] Resumed from {latest} at epoch {start_epoch} (best AUPRC {best_auprc:.4f})")

    for epoch in range(start_epoch, run.epochs):
        print(f"\nEpoch {epoch + 1}/{run.epochs}")

        batches = device_prefetch(train_src.epoch(epoch), sharding=b_shard)
        state, train_loss = train_one_epoch(
            state, train_step, batches, run.loss_mode, desc=run.train_desc
        )
        print(f"{run.train_print}: {train_loss:.4f}")

        val_batches = device_prefetch(val_src.epoch(0), sharding=b_shard)
        val_metrics = eval_one_epoch(
            state, eval_step, val_batches, 0.5, run.loss_mode, desc=run.eval_desc
        )
        print(f"{run.val_print}:", val_metrics)

        log_epoch_to_csv(
            run.metrics_csv, run.run_name, epoch + 1, train_loss, val_metrics,
            run.ckpt_path, run.config_path,
        )
        if run.progress is not None:
            run.progress(epoch + 1, train_loss, val_metrics)
        if tb_writer is not None:
            tb_writer.add_scalar("train/bce", train_loss, epoch + 1)
            for k, v in val_metrics.items():
                tb_writer.add_scalar(f"val/{k}", float(v), epoch + 1)
            tb_writer.flush()

        auprc = float(val_metrics.get("auprc_macro", -1))
        improved = auprc > best_auprc
        if improved:
            best_auprc = auprc
            epochs_no_improve = 0
            _export_best(run, state, auprc)
            print(run.best_print(best_auprc, run.ckpt_path))
        else:
            epochs_no_improve += 1

        # crash-safe resume point (every epoch, incl. the early-stop epoch)
        payload = {
            "state": jax.device_get(state),
            "epoch": epoch + 1,
            "best_auprc": best_auprc,
            "epochs_no_improve": epochs_no_improve,
        }
        tmp = os.path.join(resume_dir, "tmp_save")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ckpointer.save(tmp, payload)
        ckpointer.wait_until_finished()
        if os.path.exists(latest):
            shutil.rmtree(latest)
        os.replace(tmp, latest)

        if (
            not improved
            and run.early_stop_patience is not None
            and epochs_no_improve >= run.early_stop_patience
        ):
            print("[INFO] Early stopping.")
            break

    return state
