#!/usr/bin/env python
"""Mosaic probes, round 2: fixes for P3-P5 + precision check.

  P3b  pltpu.roll with positive shifts only
  P5b  maxpool(2) alternatives on [T, C] (pool over sublanes):
         (i) reshape [T//2, 2, C] -> max(axis=1)
        (ii) max of two sublane-offset slices x[0::2] avoided: x[i:i+..:]?
             use x[0:T:1] slices shifted by 1 then reshape
  P5c  lane-dim pool alternatives on [C, T]
  P9   dot_general with explicit HIGHEST precision inside kernel
"""

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"[PASS] {name}: {out}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:250]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        if "-v" in sys.argv:
            traceback.print_exc()


def _call(kernel, out_shape, *args, vmem=100 * 1024 * 1024):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
    )(*args)


def p3b_roll_positive():
    C, T = 64, 2560
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = pltpu.roll(x_ref[:], shift=T - 5, axis=1)  # == roll -5
        b = pltpu.roll(x_ref[:], shift=3, axis=0)
        o_ref[:] = a + b

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((C, T), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.roll(xn, -5, axis=1) + np.roll(xn, 3, axis=0)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p5b_pool_sublane_reshape():
    T, C = 2048, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T, C)), jnp.float32)

    def kernel(x_ref, o_ref):
        h = x_ref[:].reshape(T // 2, 2, C)
        o_ref[:] = jnp.max(h, axis=1)

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((T // 2, C), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = xn.reshape(T // 2, 2, C).max(axis=1)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p5b2_pool_sublane_slices():
    T, C = 2048, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T, C)), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.maximum(x_ref[0::2, :], x_ref[1::2, :])

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((T // 2, C), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.maximum(xn[0::2], xn[1::2])
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p5c_pool_lane_reshape():
    C, T = 64, 2048
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def kernel(x_ref, o_ref):
        h = x_ref[:].reshape(C, T // 2, 2)
        o_ref[:] = jnp.max(h, axis=2)

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((C, T // 2), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = xn.reshape(C, T // 2, 2).max(axis=2)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p9_highest_precision_dot():
    K, M, N = 256, 2048, 128
    a = jnp.asarray(np.random.default_rng(0).standard_normal((K, M)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((K, N)), jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = jax.jit(lambda a, b: _call(kernel, jax.ShapeDtypeStruct((M, N), jnp.float32), a, b))(a, b)
    ref = np.asarray(a).T @ np.asarray(b)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


if __name__ == "__main__":
    run("P3b roll positive shifts", p3b_roll_positive)
    run("P5b pool via sublane reshape [T/2,2,C]", p5b_pool_sublane_reshape)
    run("P5b2 pool via sublane strided slices", p5b2_pool_sublane_slices)
    run("P5c pool via lane reshape [C,T/2,2]", p5c_pool_lane_reshape)
    run("P9 TN dot HIGHEST precision", p9_highest_precision_dot)
