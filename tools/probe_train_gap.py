"""Isolate the ~49 ms/batch gap between fwd+bwd and the full train step.

bench --full (bs 4096, bf16) measures fwd 41.8 ms, fwd+bwd 131.4 ms, full
AdamW step 180.2 ms — a 48.8 ms residual attributed to "optimizer", which is
absurd for a 719k-param model (the AdamW math is < 1 ms of VPU work).  This
probe builds a ladder of step variants between the two endpoints so the
residual can be attributed:

  fwdbwd             bench's fwd+bwd (all grad leaves live, params static)
  fwdbwd_stats       + BatchNorm running-stats outputs kept live
  fwdbwd_carry       + params loop-carried (p := p - 0*g) — defeats any
                     cross-iteration hoisting of weight casts/transposes
  step_sgd           full step with SGD (carry params for real, no moments)
  step_adamw_hoistz  full AdamW step, z-score hoisted OUT of the scan body
  step_adamw         bench's full step (z-score inside the body)

Differences between adjacent rungs localize the cost.  Run on the real TPU:
    python tools/probe_train_gap.py [--batch 4096] [--iters 10]

One-shot measurement harness in the tools/probe_*.py tradition — results are
recorded in docs/ARCHITECTURE.md, not imported by the package.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ptbxl_tpu.models.factory import build_ecgcnn
    from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch
    from ptbxl_tpu.training.train_state import create_train_state, make_optimizer

    B, iters = args.batch, args.iters
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    model, variables = build_ecgcnn(num_labels=5, seed=0, dtype=dtype)
    tx = make_optimizer(1.5e-3, 1e-4)
    state = create_train_state(model, variables, tx)
    sgd = optax.sgd(1.5e-3)
    sgd_state = create_train_state(model, variables, sgd)

    @jax.jit
    def make_batch():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return {
            "ecg": jax.random.normal(k1, (B, 5000, 12), jnp.float32),
            "y": (jax.random.uniform(k2, (B, 5)) > 0.7).astype(jnp.float32),
            "mask": jnp.ones((B,), jnp.float32),
        }

    batch = jax.block_until_ready(make_batch())

    def loss_fn(params, batch_stats, x, y, mask):
        vs = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(vs, x, True, mutable=["batch_stats"])
        per = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y), -1)
        return jnp.sum(per * mask) / jnp.sum(mask), mutated["batch_stats"]

    def live(tree):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def fwdbwd(state, batch):
        x0 = zscore_per_lead_batch(batch["ecg"])

        def body(c, _):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats,
                x0 * (1.0 + c * 1e-30), batch["y"], batch["mask"])
            return (loss + live(grads) * 1e-30).astype(jnp.float32), loss

        _, losses = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return losses

    @jax.jit
    def fwdbwd_stats(state, batch):
        x0 = zscore_per_lead_batch(batch["ecg"])

        def body(c, _):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats,
                x0 * (1.0 + c * 1e-30), batch["y"], batch["mask"])
            keep = live(grads) + live(stats)
            return (loss + keep * 1e-30).astype(jnp.float32), loss

        _, losses = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return losses

    @jax.jit
    def fwdbwd_carry(state, batch):
        x0 = zscore_per_lead_batch(batch["ecg"])

        def body(params, _):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state.batch_stats, x0, batch["y"], batch["mask"])
            # loop-carry the params through a no-op update so nothing about
            # the weights can be hoisted across iterations
            new_params = jax.tree_util.tree_map(
                lambda p, g: p - g.astype(p.dtype) * 0.0, params, grads)
            return new_params, loss

        _, losses = jax.lax.scan(body, state.params, None, length=iters)
        return losses

    def full_step(tx_, hoist_z):
        def run(state, batch):
            x0 = zscore_per_lead_batch(batch["ecg"]) if hoist_z else None

            def body(s, _):
                x = x0 if hoist_z else zscore_per_lead_batch(batch["ecg"])

                def lf(params):
                    return loss_fn(params, s.batch_stats, x, batch["y"], batch["mask"])

                (loss, stats), grads = jax.value_and_grad(lf, has_aux=True)(s.params)
                updates, new_opt = tx_.update(grads, s.opt_state, s.params)
                s = s.replace(step=s.step + 1,
                              params=optax.apply_updates(s.params, updates),
                              batch_stats=stats, opt_state=new_opt)
                return s, loss

            _, losses = jax.lax.scan(body, state, None, length=iters)
            return losses

        return jax.jit(run)

    variants = [
        ("fwdbwd", fwdbwd, state),
        ("fwdbwd_stats", fwdbwd_stats, state),
        ("fwdbwd_carry", fwdbwd_carry, state),
        ("step_sgd", full_step(sgd, hoist_z=True), sgd_state),
        ("step_adamw_hoistz", full_step(tx, hoist_z=True), state),
        ("step_adamw", full_step(tx, hoist_z=False), state),
    ]

    print(f"batch={B} dtype={args.dtype} iters={iters}")
    prev = None
    for name, fn, st in variants:
        np.asarray(fn(st, batch))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(st, batch))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * float(np.median(ts)) / iters
        delta = "" if prev is None else f"  (+{ms - prev:7.2f} ms)"
        print(f"{name:18s} {ms:8.2f} ms/batch{delta}")
        prev = ms


if __name__ == "__main__":
    main()
