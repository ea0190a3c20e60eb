#!/usr/bin/env python
"""Probe: conv layer with SUBLANE-side im2col + TN matmul.

Layout: activations [Cin_pad (sublanes), T (lanes)] per sample.  Build
Y^T[k*Cin_pad + c, t] = x[c, t+k] via 15 unaligned-lane ref reads written to
8/16-aligned sublane row blocks of a VMEM scratch (both probed native-speed,
tools/probe_mosaic*.py), then one TN-form matmul
OUT[T, Cout] = dot_general(Y^T[K, T], W[K, Cout], contract dim0 x dim0),
bias+relu+pool(2) fused (pool over OUT's sublanes), transpose back to
[Cout, T/2] for layer chaining.

Compares against the bs-2048 lane-build/XLA numbers from probe_layer_perf.py.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = 15
PAD = 7

# (T_in, Cin, Cout, Cin_pad)
LAYERS = [(5000, 12, 32, 16), (2500, 32, 64, 32), (1250, 64, 128, 64), (625, 128, 256, 128)]


def timeit(fn, *args, iters=8, reps=2):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*a[:-1], a[-1] * (1.0 + c * 1e-30))
            s = jnp.sum(out[..., :1, :1].astype(jnp.float32))
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


def make_layer(t_in, cin, cout, cpad, b_tile, compute_dtype=jnp.bfloat16, transpose_out=True):
    t_out = t_in
    t_pool = t_out // 2
    K = KS * cpad

    def kernel(w_ref, b_ref, x_ref, o_ref, y_scratch):
        w = w_ref[:].astype(compute_dtype)  # [K, Cout]
        bias = b_ref[:].astype(jnp.float32)
        for b in range(b_tile):
            for k in range(KS):
                y_scratch[k * cpad : (k + 1) * cpad, :] = (
                    x_ref[b, :, k : k + t_out].astype(compute_dtype)
                )
            acc = jax.lax.dot_general(
                y_scratch[:], w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, Cout]
            h = jnp.maximum(acc + bias[None, :], 0.0)
            h = jnp.max(h[: 2 * t_pool].reshape(t_pool, 2, cout), axis=1)
            if transpose_out:
                o_ref[b] = h.T  # [Cout, T/2] for the next layer's layout
            else:
                o_ref[b] = h

    out_shape = (b_tile and 0) or None  # silence lints

    @jax.jit
    def run(w, bias, x):
        b_total = x.shape[0]
        oshape = (b_total, cout, t_pool) if transpose_out else (b_total, t_pool, cout)
        oblock = (b_tile, cout, t_pool) if transpose_out else (b_tile, t_pool, cout)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            grid=(b_total // b_tile,),
            in_specs=[
                pl.BlockSpec((K, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_tile, cpad, t_in + 2 * PAD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(oblock, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((K, t_out), compute_dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * K * cout * t_out * b_total,
                bytes_accessed=b_total * (cpad * t_in + t_pool * cout) * 4,
                transcendentals=0,
            ),
        )(w, bias, x)

    return run


def main():
    rng = np.random.default_rng(0)
    B = 2048
    print(f"batch={B} sublane-build TN conv")
    total = 0.0
    for (t_in, cin, cout, cpad) in LAYERS:
        # x [B, Cin_pad, T+14]: channels on sublanes, zero-padded channels+time
        x = jax.block_until_ready(jax.jit(
            lambda t=t_in, c=cpad: jax.random.normal(
                jax.random.PRNGKey(1), (B, c, t + 2 * PAD), jnp.float32))())
        w = jnp.asarray(rng.standard_normal((KS * cpad, cout)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((cout,)) * 0.01, jnp.float32)
        flops = 2 * KS * cin * cout * t_in * B  # true flops (unpadded)
        for b_tile in (8, 16):
            try:
                fn = make_layer(t_in, cin, cout, cpad, b_tile)
                dt = timeit(fn, w, bias, x)
                if b_tile == 8:
                    total += dt
                print(f"L({t_in:5d},{cin:3d}->{cout:3d}) bt{b_tile}: {dt*1e6:9.1f} us  "
                      f"{flops/dt/1e12:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"L({t_in:5d},{cin:3d}->{cout:3d}) bt{b_tile}: FAIL "
                      f"{type(e).__name__}: {str(e)[:110]}")
    if total:
        print(f"stack total (bt8): {total*1e6:9.1f} us -> {B/total:9.0f} rec/s")


if __name__ == "__main__":
    main()
