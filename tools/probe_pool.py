"""Time MaxPool1d(2) formulations, forward and backward, at training shape.

probe_bwd_breakdown.py fingerprinted SelectAndScatter (reduce_window's VJP)
as a major backward cost; swapping in a reshape+axis-max pool then SLOWED
the forward by ~21 ms/step at bs 4096 (the [B,T,C]→[B,T/2,2,C] reshape
splits the sublane dim and breaks the BN/ReLU/pool fusion).  This probe
prices each formulation in isolation on the real shapes so the model can
pick the fastest fwd AND bwd:

  rw       nn.max_pool-style reduce_window (VJP = SelectAndScatter)
  reshape  x.reshape(B,U,2,C).max(2)       (VJP = elementwise mask)
  strided  maximum(x[:,0::2], x[:,1::2])   (VJP = elementwise mask)
  hybrid   custom_vjp: reduce_window fwd, strided-mask bwd

Run: python tools/probe_pool.py [--batch 4096]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, iters = args.batch, args.iters

    def pool_rw(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 1), (1, 2, 1), "VALID")

    def pool_reshape(x):
        Bb, T, C = x.shape
        return x[:, : (T // 2) * 2].reshape(Bb, T // 2, 2, C).max(axis=2)

    def pool_strided(x):
        T = x.shape[1]
        e = (T // 2) * 2
        return jnp.maximum(x[:, 0:e:2], x[:, 1:e:2])

    @jax.custom_vjp
    def pool_hybrid(x):
        return pool_rw(x)

    def _h_fwd(x):
        y = pool_rw(x)
        return y, (x, y)

    def _h_bwd(res, g):
        x, y = res
        T = x.shape[1]
        e = (T // 2) * 2
        xe, xo = x[:, 0:e:2], x[:, 1:e:2]
        me = (xe == y).astype(g.dtype)
        mo = (xo == y).astype(g.dtype)
        scale = g / (me + mo)
        de, do = me * scale, mo * scale
        dx = jnp.zeros(x.shape, g.dtype)
        dx = dx.at[:, 0:e:2].set(de)
        dx = dx.at[:, 1:e:2].set(do)
        return (dx,)

    pool_hybrid.defvjp(_h_fwd, _h_bwd)

    shapes = [(5000, 32), (2500, 64), (1250, 128), (625, 256)]
    pools = {"rw": pool_rw, "reshape": pool_reshape, "strided": pool_strided,
             "hybrid": pool_hybrid}

    def make_runs(pool):
        def f(x):
            return jnp.sum(pool(jax.nn.relu(x)).astype(jnp.float32))

        @jax.jit
        def fwd(x):
            def body(c, _):
                return c + f(x * (1.0 + c * 1e-30)) * 1e-30, 0.0
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        @jax.jit
        def fwdbwd(x):
            def body(c, _):
                v, g = jax.value_and_grad(f)(x * (1.0 + c * 1e-30))
                return c + (v + jnp.sum(g).astype(jnp.float32)) * 1e-30, 0.0
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        return fwd, fwdbwd

    def timed(fn, x):
        np.asarray(fn(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(ts)) / iters

    print(f"batch={B} iters={iters}  (ms per pass, all four layer shapes summed)")
    for name, pool in pools.items():
        tf = tb = 0.0
        for T, C in shapes:
            x = jax.block_until_ready(
                jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.bfloat16))
            fwd, fwdbwd = make_runs(pool)
            tf += timed(fwd, x)
            tb += timed(fwdbwd, x)
            del x
        print(f"{name:8s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms   bwd-only {tb - tf:7.2f} ms")


if __name__ == "__main__":
    main()
