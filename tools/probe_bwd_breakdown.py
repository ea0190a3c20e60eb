"""Attribute the training backward's cost per block and per gradient kind.

probe_train_gap.py established (bs 4096, bf16): fwd 41.8 ms, bwd 136.6 ms,
optimizer ~1.6 ms.  FLOP accounting says bwd should be ~1.95x fwd (L1's
dgrad is dead — input layer), i.e. ~82 ms at forward's efficiency; the
extra ~55 ms lives somewhere in the gradient convs / pool / BN backward.

Two ladders, both chained-scan timed (same methodology as bench.py):

  depth ladder   stop_gradient after block i kills the backward BELOW the
                 stop (blocks 1..i contribute forward only) — successive
                 differences price each block's full backward slice
                 (dgrad + wgrad + pool/relu/BN backward).

  wgrad ladder   stop_gradient on block i's params kills ONLY its weight
                 gradient (dgrad still flows through) — difference vs the
                 full step prices that block's wgrad conv alone.

Run on the real TPU:  python tools/probe_bwd_breakdown.py [--batch 4096]

One-shot measurement harness (tools/probe_*.py tradition); findings land in
docs/ARCHITECTURE.md.
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

    B, iters = args.batch, args.iters
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    model, variables = build_ecgcnn(num_labels=5, seed=0, dtype=dtype)
    params0, stats0 = variables["params"], variables["batch_stats"]

    @jax.jit
    def make_batch():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return {
            "ecg": jax.random.normal(k1, (B, 5000, 12), jnp.float32),
            "y": (jax.random.uniform(k2, (B, 5)) > 0.7).astype(jnp.float32),
            "mask": jnp.ones((B,), jnp.float32),
        }

    batch = jax.block_until_ready(make_batch())

    def forward(params, x, stop_depth=None, freeze_block=None, freeze_kernel=None):
        """Manual block-by-block forward mirroring ECGCNN.__call__ (train
        mode, batch stats discarded) with surgical stop_gradients.

        stop_depth=i: stop_gradient on the activation AFTER block i(1-based)
        freeze_block=i: stop_gradient on block i's params (kills its wgrad)
        """
        if freeze_block is not None:
            key = f"blocks_{freeze_block - 1}"
            params = dict(params)
            params[key] = jax.tree_util.tree_map(
                jax.lax.stop_gradient, params[key])
        if freeze_kernel is not None:
            # kernel-only freeze: kills JUST that block's wgrad while the
            # BN affine grads keep the pool/relu/BN backward alive —
            # disambiguates wgrad vs pool-bwd inside a block's bundle
            key = f"blocks_{freeze_kernel - 1}"
            params = dict(params)
            blk = dict(params[key])
            conv = dict(blk["conv"])
            conv["kernel"] = jax.lax.stop_gradient(conv["kernel"])
            blk["conv"] = conv
            params[key] = blk
        bound = model.bind({"params": params, "batch_stats": stats0},
                           mutable=["batch_stats"])
        h = x
        for bi, blk in enumerate(bound.blocks, start=1):
            h = blk(h, True)
            if stop_depth == bi:
                h = jax.lax.stop_gradient(h)
        g = jnp.mean(h, axis=1)
        z = bound.proj(g)
        return bound.head(z)

    def make_fwdbwd(**fw_kw):
        def loss_fn(params, x, y, mask):
            logits = forward(params, x, **fw_kw)
            per = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y), -1)
            return jnp.sum(per * mask) / jnp.sum(mask)

        @jax.jit
        def run(params, batch):
            x0 = zscore_per_lead_batch(batch["ecg"])

            def body(c, _):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, x0 * (1.0 + c * 1e-30), batch["y"], batch["mask"])
                g = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))
                return (loss + g * 1e-30).astype(jnp.float32), loss

            _, losses = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return losses

        return run

    def timed(fn):
        np.asarray(fn(params0, batch))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(params0, batch))
            ts.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(ts)) / iters

    print(f"batch={B} dtype={args.dtype} iters={iters}")
    full = timed(make_fwdbwd())
    print(f"full fwdbwd        {full:8.2f} ms/batch")

    prev = None
    for d in (1, 2, 3):
        ms = timed(make_fwdbwd(stop_depth=d))
        note = f"  block{d}+below bwd = {full - ms:6.2f} ms" if d == 1 else (
            f"  block{d} bwd slice = {prev - ms:6.2f} ms")
        print(f"stop after b{d}      {ms:8.2f} ms/batch{note}")
        prev = ms

    for fb in (1, 2, 3, 4):
        ms = timed(make_fwdbwd(freeze_block=fb))
        print(f"freeze b{fb} params   {ms:8.2f} ms/batch  wgrad{fb}+pool{fb}bwd = {full - ms:6.2f} ms")

    for fk in (1, 2, 3, 4):
        ms = timed(make_fwdbwd(freeze_kernel=fk))
        print(f"freeze k{fk} kernel   {ms:8.2f} ms/batch  wgrad{fk} alone = {full - ms:6.2f} ms")


if __name__ == "__main__":
    main()
