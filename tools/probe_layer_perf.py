#!/usr/bin/env python
"""Per-layer conv kernel strategy benchmark on the real chip.

For each ECGCNN layer geometry (reference conv stack:
/root/reference/src/models/ecg_cnn.py:35-50), measures records/sec-equivalent
throughput of:

  A. Pallas im2col: Y = lane-concat of 15 shifted slices -> ONE [M,K]x[K,N]
     matmul (K = 15*Cin), conv+bias+relu+pool fused, bf16 inputs
  B. Pallas direct: 15 shifted [M,Cin]x[Cin,Cout] matmuls (round-1 design)
  C. XLA conv_general_dilated + bias + relu + pool (bf16 default precision)

Timing: scan-chained iterations inside one jit (amortizes the dev tunnel).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 15
PAD = 7

# (T_in, Cin, Cout): the four reference layers
LAYERS = [(5000, 12, 32), (2500, 32, 64), (1250, 64, 128), (625, 128, 256)]


def timeit(fn, *args, iters=8, reps=2):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*a[:-1], a[-1] * (1.0 + c * 1e-30))
            s = jnp.sum(out[..., :1, :].astype(jnp.float32))
            return s, s

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    np.asarray(many(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def make_pallas_layer(t_in, cin, cout, mode, b_tile, compute_dtype=jnp.bfloat16):
    """One conv(k15,SAME)+bias+relu+pool(2) layer as a Pallas kernel."""

    t_out = t_in  # SAME conv
    t_pool = t_out // 2

    def kernel(w_ref, b_ref, x_ref, o_ref):
        w = w_ref[:].astype(compute_dtype)  # [15*Cin, Cout] or [15, Cin, Cout]
        bias = b_ref[:].astype(jnp.float32)
        for b in range(b_tile):
            if mode == "im2col":
                # NB: slices must come from the REF (value-level slice+concat
                # crashes Mosaic, see docs/ARCHITECTURE.md)
                y = jnp.concatenate(
                    [x_ref[b, k : k + t_out, :].astype(compute_dtype) for k in range(K)],
                    axis=1,
                )
                acc = jax.lax.dot_general(
                    y, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:  # direct
                xc = x_ref[b].astype(compute_dtype)
                wr = w.reshape(K, cin, cout)
                acc = jnp.zeros((t_out, cout), jnp.float32)
                for k in range(K):
                    acc += jax.lax.dot_general(
                        xc[k : k + t_out, :], wr[k],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            h = jnp.maximum(acc + bias[None, :], 0.0)
            h = jnp.max(h[: 2 * t_pool].reshape(t_pool, 2, cout), axis=1)
            o_ref[b] = h

    @jax.jit
    def run(w, bias, x):
        b_total = x.shape[0]
        grid = b_total // b_tile
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b_total, t_pool, cout), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((K * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_tile, t_in + 2 * PAD, cin), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_tile, t_pool, cout), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * K * cin * cout * t_out * b_total,
                bytes_accessed=(b_total * (t_in + 14) * cin + b_total * t_pool * cout) * 4,
                transcendentals=0,
            ),
        )(w, bias, x)

    return run


def xla_layer(t_in, cin, cout):
    @jax.jit
    def run(w, bias, x):
        # x [B, T+14, Cin] pre-padded (VALID == SAME on the unpadded signal)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.reshape(K, cin, cout).astype(jnp.bfloat16),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(y + bias[None, None, :], 0.0)
        b, t, c = h.shape
        half = t // 2  # torch MaxPool1d(2) floors odd lengths
        return jnp.max(h[:, : 2 * half].reshape(b, half, 2, c), axis=2)

    return run


def main():
    rng = np.random.default_rng(0)
    B = 2048
    print(f"batch={B}  (rec/s numbers are per-layer-only equivalents)")
    total = {"im2col": 0.0, "direct": 0.0, "xla": 0.0}
    for (t_in, cin, cout) in LAYERS:
        x = jax.block_until_ready(jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(1), (B, t_in + 2 * PAD, cin), jnp.float32))())
        w = jnp.asarray(rng.standard_normal((K * cin, cout)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((cout,)) * 0.01, jnp.float32)

        flops = 2 * K * cin * cout * t_in * B
        row = f"L({t_in:5d},{cin:3d}->{cout:3d})"

        for mode, b_tile in [("im2col", 8), ("im2col", 16), ("direct", 8)]:
            try:
                fn = make_pallas_layer(t_in, cin, cout, mode, b_tile)
                dt = timeit(fn, w, bias, x)
                tf = flops / dt / 1e12
                key = mode if mode == "direct" else "im2col"
                if (mode, b_tile) in [("im2col", 16), ("direct", 8)]:
                    total[key] += dt
                print(f"{row} pallas-{mode}/bt{b_tile}: {dt*1e6:9.1f} us  {tf:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"{row} pallas-{mode}/bt{b_tile}: FAIL {type(e).__name__}: {str(e)[:120]}")

        fn = xla_layer(t_in, cin, cout)
        dt = timeit(fn, w, bias, x)
        total["xla"] += dt
        print(f"{row} xla-conv bf16:        {dt*1e6:9.1f} us  {flops/dt/1e12:6.1f} TF/s")

    print("\nstack totals (conv layers only):")
    for k, v in total.items():
        if v:
            print(f"  {k:7s}: {v*1e6:9.1f} us -> {B/v:10.0f} rec/s")


if __name__ == "__main__":
    main()
