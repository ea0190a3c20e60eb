#!/usr/bin/env python
"""Can the zscore block's 0.43 us/rec ceiling headroom be captured?

The round-5 ceiling decomposition (bench_ceiling, docs/ARCHITECTURE.md
"Single-chip ceiling") pins the per-lead z-score at 0.721 us/rec measured vs
a 0.293 us/rec one-read-one-write HBM bound — XLA evaluates the two-pass
mean/var/normalize as separate HBM passes.  Candidates:

  * xla          — shipping two-pass form (baseline)
  * xla_onepass  — var = E[x^2]-E[x]^2, one fused reduction read + one
                   normalize read + write (preprocess.zscore_per_lead_batch_onepass)
  * pallas       — [1, T, 12] block-per-record single-pass kernel
                   (ops/pallas/zscore.zscore_pallas; 12/128 lanes, contiguous
                   HBM, 24-byte VMEM rows — DMA-engine question)
  * pallas_wide  — lane-remap kernel [kb, 125, 480] (94% lane occupancy,
                   per-lead fold via one tiny MXU matmul); XLA reshapes
                   outside the kernel may or may not be free — measured here

Measured two ways, both at the headline geometry (bs 11264, bf16 wire):
standalone (zscore only, chained in one jit) and IN-MODEL (the full int8
(1,3) quantized forward with only the zscore impl swapped) — the in-model
number is the one that decides shipping (microbenchmarks lie on this
backend; docs/ARCHITECTURE.md measurement traps).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ptbxl_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ptbxl_tpu.models.params_io import load_npz  # noqa: E402
from ptbxl_tpu.ops.preprocess import (  # noqa: E402
    zscore_per_lead_batch,
    zscore_per_lead_batch_onepass,
)
from ptbxl_tpu.ops.pallas.zscore import zscore_pallas, zscore_pallas_wide  # noqa: E402
from ptbxl_tpu.ops.quant import (  # noqa: E402
    make_quantized_forward,
    quantize_model,
    split_meta,
)

BS = int(os.environ.get("PROBE_BS", "11264"))
ITERS = int(os.environ.get("PROBE_ITERS", "20"))


def variants():
    out = {
        "xla": lambda x: zscore_per_lead_batch(x.astype(jnp.float32)),
        "xla_onepass": zscore_per_lead_batch_onepass,
        "pallas": lambda x: zscore_pallas(x, out_dtype=jnp.bfloat16),
    }
    for kb in (4, 8, 16):
        out[f"pallas_wide_b{kb}"] = (
            lambda x, kb=kb: zscore_pallas_wide(x, out_dtype=jnp.bfloat16, block_b=kb)
        )
    for w in (240, 1200):
        out[f"pallas_wide_w{w}"] = (
            lambda x, w=w: zscore_pallas_wide(x, out_dtype=jnp.bfloat16, width=w)
        )
    return out


def _timed(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_standalone(zs, batch):
    @jax.jit
    def many(x):
        def body(carry, _):
            h = zs(x * (1.0 + carry * 1e-30))
            return jnp.sum(h[:, :1, :1].astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    dt = _timed(many, batch)
    return dt / ITERS / batch.shape[0] * 1e6  # us/rec


def bench_inmodel(zs, q_arrs, fwd_nonorm, batch):
    def forward(q, x):
        return fwd_nonorm(q, zs(x))

    @jax.jit
    def many(q, x):
        def body(carry, _):
            probs = forward(q, x * (1.0 + carry * 1e-30))
            return jnp.sum(probs).astype(jnp.float32), jnp.sum(probs)

        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return sums

    dt = _timed(many, q_arrs, batch)
    return batch.shape[0] * ITERS / dt  # rec/s


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    variables, _ = load_npz(ckpt)
    q = quantize_model(variables, arch="ecgcnn")
    arrs, n_blocks, layers = split_meta(q)
    fwd_norm = make_quantized_forward(n_blocks, layers, arch="ecgcnn")
    fwd_nonorm = make_quantized_forward(n_blocks, layers, arch="ecgcnn", normalize=False)

    batch = jax.block_until_ready(
        jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(0), (BS, 5000, 12), jnp.bfloat16)
        )()
    )

    print(f"# bs={BS} iters={ITERS} device={jax.devices()[0].platform}")
    print(f"{'variant':<18} {'standalone us/rec':>18} {'in-model rec/s':>15}")

    # shipping baseline: the normalize-inside forward exactly as benched
    rps0 = bench_inmodel(lambda x: x, arrs, fwd_norm, batch)
    print(f"{'ship (xla-in-fwd)':<18} {'-':>18} {rps0:>15.0f}")

    for name, zs in variants().items():
        try:
            us = bench_standalone(zs, batch)
        except Exception as e:
            print(f"{name:<18} standalone FAILED: {type(e).__name__}: {e}")
            us = float("nan")
        try:
            rps = bench_inmodel(zs, arrs, fwd_nonorm, batch)
        except Exception as e:
            print(f"{name:<18} in-model FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:<18} {us:>18.3f} {rps:>15.0f}  ({(rps / rps0 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
