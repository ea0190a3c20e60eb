#!/usr/bin/env python
"""Does XLA's emitter engage int8 MXU modes on this backend?

docs/ARCHITECTURE.md settled that *Mosaic* int8 shows no speedup (44 vs 43
TF/s), but XLA's own dot/conv emitters are a different code path.  v5e lists
~394 int8 TOPS vs ~197 bf16 TF/s; if XLA int8 runs ~2x bf16, a quantized
inference path beats the current headline.

Methodology (all three ARCHITECTURE.md measurement traps):
  * iterations are chained by feeding each op's output back as its input
    (cast to the operand dtype), UNROLLED inside one jit — no scan-step
    overhead, no factorable perturbation, nothing loop-invariant to hoist;
  * per-iteration work is TFLOP-scale so tunnel dispatch is amortized;
  * results materialized with np.asarray.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit_chain(step, x0, iters=8, reps=3):
    """step: x -> x (same shape+dtype). Returns seconds per iteration."""

    @jax.jit
    def many(x):
        for _ in range(iters):
            x = step(x)
        return jnp.sum(x[..., :1].astype(jnp.float32))

    np.asarray(many(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(x0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def probe_dot(m, n, label):
    """Square chained dot: x[M,N] @ w[N,N] -> x."""
    rng = np.random.default_rng(0)
    flops = 2.0 * m * n * n

    wf = jnp.asarray(rng.standard_normal((n, n)) * (1.0 / np.sqrt(n)), jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)

    def step_bf16(x):
        y = jax.lax.dot_general(x, wf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    dt = timeit_chain(step_bf16, xf)
    print(f"{label} bf16: {dt*1e6:9.1f} us  {flops/dt/1e12:6.1f} TF/s")

    wi = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    xi = jnp.asarray(rng.integers(-127, 127, (m, n)), jnp.int8)

    def step_int8(x):
        y = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y >> 7).astype(jnp.int8)  # cheap requantize-ish, keeps chain live

    try:
        dt = timeit_chain(step_int8, xi)
        print(f"{label} int8: {dt*1e6:9.1f} us  {flops/dt/1e12:6.1f} TOP/s")
    except Exception as e:  # noqa: BLE001
        print(f"{label} int8: FAIL {type(e).__name__}: {str(e)[:140]}")


def probe_conv(t, c, batch, k=15):
    """Chained SAME conv, Cin=Cout so output feeds input."""
    rng = np.random.default_rng(1)
    flops = 2.0 * k * c * c * t * batch

    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=acc,
        )

    wf = jnp.asarray(rng.standard_normal((k, c, c)) * (1.0 / np.sqrt(k * c)), jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((batch, t, c)), jnp.bfloat16)

    def step_bf16(x):
        return conv(x, wf, jnp.float32).astype(jnp.bfloat16)

    dt = timeit_chain(step_bf16, xf)
    print(f"conv(T={t},C={c},B={batch}) bf16: {dt*1e6:9.1f} us  {flops/dt/1e12:6.1f} TF/s")

    wi = jnp.asarray(rng.integers(-127, 127, (k, c, c)), jnp.int8)
    xi = jnp.asarray(rng.integers(-127, 127, (batch, t, c)), jnp.int8)

    def step_int8(x):
        return (conv(x, wi, jnp.int32) >> 7).astype(jnp.int8)

    try:
        dt = timeit_chain(step_int8, xi)
        print(f"conv(T={t},C={c},B={batch}) int8: {dt*1e6:9.1f} us  {flops/dt/1e12:6.1f} TOP/s")
    except Exception as e:  # noqa: BLE001
        print(f"conv(T={t},C={c},B={batch}) int8: FAIL {type(e).__name__}: {str(e)[:140]}")


def main():
    d = jax.devices()[0]
    print(f"backend: {d.platform} {d.device_kind}")
    probe_dot(65536, 2048, "dot 65536x2048x2048")   # 0.55 TFLOP/iter
    probe_conv(625, 256, 2048)                       # L4-like deep conv, 2.5 TFLOP/iter
    probe_conv(1250, 128, 2048)                      # L3-like, 1.2 TFLOP/iter
    probe_conv(2500, 64, 2048)                       # L2-like (occupancy-bound regime)


if __name__ == "__main__":
    main()
