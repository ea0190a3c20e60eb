#!/usr/bin/env python
"""Mosaic capability probes for the batched conv kernel design (round 2).

Round 1's im2col kernel was blocked on two assumed Mosaic limitations
(unaligned lane concatenation, multi-dim contractions).  The round-2 design
(docs/ARCHITECTURE.md) needs a precise support/cost map, so each candidate
primitive is probed in isolation on the real chip:

  P1  dot_general TN form: contract dim0(LHS) x dim0(RHS)  [K,M]x[K,N]->[M,N]
  P2  dot_general NT form: contract dim1 x dim1            [M,K]x[N,K]->[M,N]
  P3  pltpu.roll along lanes / sublanes
  P4  writes to sublane-offset row blocks (offsets multiple of 8)
  P5  strided slices: sublane stride 2, lane stride 2
  P6  unaligned (non-128) static lane slice reads
  P7  unaligned lane-dim concatenation (round-1 blocker — expect fail?)
  P8  in-kernel transpose [T, C] -> [C, T]

Each probe prints PASS/FAIL + max-abs-error vs a numpy reference, plus a
rough on-chip time from scan-chaining where meaningful.
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
        msg = str(e).split("\n")[0][:300]
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


def p1_tn_dot():
    K, M, N = 256, 2048, 128
    a = jnp.asarray(np.random.default_rng(0).standard_normal((K, M)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((K, N)), jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = jax.jit(lambda a, b: _call(kernel, jax.ShapeDtypeStruct((M, N), jnp.float32), a, b))(a, b)
    ref = np.asarray(a).T @ np.asarray(b)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p2_nt_dot():
    M, K, N = 2048, 256, 128
    a = jnp.asarray(np.random.default_rng(0).standard_normal((M, K)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((N, K)), jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = jax.jit(lambda a, b: _call(kernel, jax.ShapeDtypeStruct((M, N), jnp.float32), a, b))(a, b)
    ref = np.asarray(a) @ np.asarray(b).T
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p3_rolls():
    C, T = 64, 2560
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = pltpu.roll(x_ref[:], shift=-5, axis=1)   # lane roll
        b = pltpu.roll(x_ref[:], shift=3, axis=0)    # sublane roll
        o_ref[:] = a + b

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((C, T), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.roll(xn, -5, axis=1) + np.roll(xn, 3, axis=0)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p4_subblock_write():
    C, T = 16, 1024
    KS = 15
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def kernel(x_ref, o_ref):
        for k in range(KS):
            o_ref[k * C : (k + 1) * C, :] = pltpu.roll(x_ref[:], shift=-k, axis=1)

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((KS * C, T), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.concatenate([np.roll(xn, -k, axis=1) for k in range(KS)], axis=0)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p5_strided_slices():
    C, T = 64, 2048
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def k_sub(x_ref, o_ref):
        o_ref[:] = jnp.maximum(x_ref[0::2, :], x_ref[1::2, :])  # sublane stride 2

    def k_lane(x_ref, o_ref):
        o_ref[:] = jnp.maximum(x_ref[:, 0::2], x_ref[:, 1::2])  # lane stride 2

    xn = np.asarray(x)
    o1 = jax.jit(lambda x: _call(k_sub, jax.ShapeDtypeStruct((C // 2, T), jnp.float32), x))(x)
    e1 = np.abs(np.asarray(o1) - np.maximum(xn[0::2], xn[1::2])).max()
    o2 = jax.jit(lambda x: _call(k_lane, jax.ShapeDtypeStruct((C, T // 2), jnp.float32), x))(x)
    e2 = np.abs(np.asarray(o2) - np.maximum(xn[:, 0::2], xn[:, 1::2])).max()
    return f"sublane err={e1:.2e}, lane err={e2:.2e}"


def p6_unaligned_lane_slice():
    C, T = 32, 2048
    W = 1024
    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, T)), jnp.float32)

    def kernel(x_ref, o_ref):
        acc = jnp.zeros((C, W), jnp.float32)
        for k in range(15):
            acc = acc + x_ref[:, k : k + W]
        o_ref[:] = acc

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((C, W), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = sum(xn[:, k : k + W] for k in range(15))
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p7_unaligned_lane_concat():
    T, C = 512, 12
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T + 14, C)), jnp.float32)

    def kernel(x_ref, o_ref):
        parts = [x_ref[k : k + T, :] for k in range(15)]
        o_ref[:] = jnp.concatenate(parts, axis=1)  # lane concat at 12-mult offsets

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((T, 15 * C), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.concatenate([xn[k : k + T] for k in range(15)], axis=1)
    return f"err={np.abs(np.asarray(out) - ref).max():.2e}"


def p8_transpose():
    T, C = 2048, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T, C)), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    out = jax.jit(lambda x: _call(kernel, jax.ShapeDtypeStruct((C, T), jnp.float32), x))(x)
    return f"err={np.abs(np.asarray(out) - np.asarray(x).T).max():.2e}"


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("P1 TN dot_general (contract dim0 x dim0)", p1_tn_dot)
    run("P2 NT dot_general (contract dim1 x dim1)", p2_nt_dot)
    run("P3 pltpu.roll lanes+sublanes", p3_rolls)
    run("P4 sublane-offset block writes (im2col build)", p4_subblock_write)
    run("P5 strided slices (pool)", p5_strided_slices)
    run("P6 unaligned static lane slices", p6_unaligned_lane_slice)
    run("P7 unaligned lane concat (round-1 blocker)", p7_unaligned_lane_concat)
    run("P8 in-kernel transpose", p8_transpose)
