#!/usr/bin/env python
"""Is block2's 0.66 us/rec ceiling headroom capturable?

The ceiling decomposition (docs/ARCHITECTURE.md "Single-chip ceiling") has
block2 (the 64->128 bf16 conv at T=1250) running at ~127 TF/s in-model vs
the 174 TF/s the deeper layers reach.  Hypotheses probed, all at the
headline geometry (bs 11264, int8 layers (1,3)):

  h1  int8->bf16 boundary: block1's int8 path hands block2 a bf16 pooled
      activation whose layout the emitter may dislike.  Compare the
      block2 increment in the shipping stack vs an all-bf16 stack (same
      geometry, bf16 block1).
  h2  accumulator hint: preferred_element_type bf16 instead of f32 for
      block2 only (MXU accumulates f32 regardless; the hint changes the
      emitter's output handling).
  h3  f32 hand-off: dequantize block1's output to f32, pool f32, cast to
      bf16 at block2's input (one extra memory pass, but a 'clean' layout).

Methodology: progressive-prefix increments (P3 - P2) scan-chained in one
jit, exactly like bench_ceiling — the increment IS block2's in-model cost.
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
from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch_onepass  # noqa: E402
from ptbxl_tpu.ops.quant import (  # noqa: E402
    _quantize_act,
    quantize_model,
    split_meta,
)

BS = int(os.environ.get("PROBE_BS", "11264"))
ITERS = int(os.environ.get("PROBE_ITERS", "10"))
# block2 FLOPs/record: 2 * T_in(1250) * K(15) * Cin(64) * Cout(128)
B2_FLOPS = 2 * 1250 * 15 * 64 * 128


def conv(h, w, pet):
    return jax.lax.conv_general_dilated(
        h, w, window_strides=(1,), padding=[(7, 7)],
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=pet,
    )


def pool(a):
    init = jnp.asarray(
        jnp.iinfo(jnp.int8).min if a.dtype == jnp.int8 else -jnp.inf, a.dtype
    )
    return jax.lax.reduce_window(a, init, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID")


def stack_prefix(q, x, k, mode):
    """First k blocks; mode controls the block1->block2 hand-off."""
    h = zscore_per_lead_batch_onepass(x)
    for i in range(k):
        if i in (1, 3) and mode != "all_bf16":
            xq = h if h.dtype == jnp.int8 else _quantize_act(h, q[f"sx{i}"])
            y = conv(xq, q[f"w{i}"], jnp.int32)
            if mode == "f32_handoff" and i == 1:
                hs = y.astype(jnp.float32) * q[f"sw{i}"]
                a = jnp.maximum(hs + q[f"b{i}"], 0.0)
                h = pool(a).astype(jnp.bfloat16)
                continue
            hs = y.astype(jnp.bfloat16) * q[f"sw{i}"].astype(jnp.bfloat16)
        else:
            w = q[f"w{i}"]
            if w.dtype == jnp.int8:  # all_bf16 mode reuses the folded f32-ish weights
                w = (w.astype(jnp.float32) * q[f"sw{i}"] / q[f"sx{i}"][None, :, None]
                     ).astype(jnp.bfloat16)
            pet = jnp.bfloat16 if (mode == "pet_bf16" and i == 2) else jnp.float32
            y = conv(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16), pet)
            hs = y.astype(jnp.bfloat16)
        a = jnp.maximum(hs + q[f"b{i}"].astype(jnp.bfloat16), 0.0)
        if (i + 1) in (1, 3) and mode != "all_bf16":
            a = _quantize_act(a, q[f"sx{i + 1}"])
        h = pool(a)
    return jnp.sum(h if h.dtype != jnp.int8 else h.astype(jnp.bfloat16)).astype(
        jnp.float32
    )


def timed(q, batch, k, mode):
    @jax.jit
    def many(a, x):
        def body(c, _):
            s = stack_prefix(a, x * (1.0 + c * 1e-30), k, mode)
            return s.astype(jnp.float32), s

        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return sums

    np.asarray(many(q, batch))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many(q, batch))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / (BS * ITERS)


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    variables, _ = load_npz(
        os.path.join(here, "outputs/ecg_baseline/ckpts/ecg_baseline_best.npz")
    )
    q, _, _ = split_meta(quantize_model(variables, arch="ecgcnn"))
    batch = jax.block_until_ready(
        jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(0), (BS, 5000, 12), jnp.bfloat16)
        )()
    )
    print(f"# bs={BS} iters={ITERS} device={jax.devices()[0].platform}")
    print(f"{'mode':<14} {'P2 us/rec':>10} {'P3 us/rec':>10} {'block2 us':>10} {'TF/s':>7}")
    for mode in ("ship", "pet_bf16", "f32_handoff", "all_bf16"):
        p2 = timed(q, batch, 2, mode) * 1e6
        p3 = timed(q, batch, 3, mode) * 1e6
        b2 = p3 - p2
        print(f"{mode:<14} {p2:>10.3f} {p3:>10.3f} {b2:>10.3f} {B2_FLOPS / b2 / 1e6:>7.1f}")


if __name__ == "__main__":
    main()
