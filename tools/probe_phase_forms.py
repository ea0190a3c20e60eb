"""Price the phase-domain block's building forms at training shape.

phase-mode v1 (stride-2 k=16 conv -> 4-D BN/relu/max) measured fwd 59.3 ms
vs the standard path's 41.8 ms at bs 4096 — this probe attributes the
regression between (a) the strided conv lowering and (b) the 4-D
[B,U,2,C] elementwise tail, and prices the stride-1 pair-merged
alternative (the ops/phase_pack.py conv2 trick):

  conv_s1        standard SAME stride-1 conv        [B,T,Ci]  -> [B,T,Co]
  conv_s2p       stride-2 k+1 phase conv            [B,T,Ci]  -> [B,U,2Co]
  conv_pair      pair-merged stride-1 k=(k+1)/2+1   [B,U,2Ci] -> [B,U,2Co]
  tail4d         BN-ish + relu + max on [B,U,2,C]
  tail3d         same math on [B,U,2C] via lane-halves

Run: python tools/probe_phase_forms.py [--batch 4096]
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
    shapes = [(5000, 12, 32), (2500, 32, 64), (1250, 64, 128)]
    k = 15

    def timed(fn, *xs):
        @jax.jit
        def run(*xs):
            def body(c, _):
                out = fn(*[x * (1.0 + c * 1e-30).astype(x.dtype) if i == 0
                           else x for i, x in enumerate(xs)])
                return (c + jnp.sum(out[:1, :1]).astype(jnp.float32) * 1e-30,
                        0.0)
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        np.asarray(run(*xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*xs))
            ts.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(ts)) / iters

    key = jax.random.PRNGKey(0)
    print(f"batch={B} iters={iters} (ms per pass, bf16)")
    for (T, Ci, Co) in shapes:
        U = T // 2
        x = jax.random.normal(key, (B, T, Ci), jnp.bfloat16)
        w = jax.random.normal(key, (k, Ci, Co), jnp.bfloat16)

        def conv_s1(x, w=w):
            return lax.conv_general_dilated(
                x, w, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"))

        from ptbxl_tpu.ops.phase_conv import build_phase_kernel
        wp = build_phase_kernel(w)  # [16, Ci, 2Co]

        def conv_s2p(x, wp=wp):
            return lax.conv_general_dilated(
                x, wp, (2,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"))

        # pair-merged: xq [B, (T+16)/2, 2Ci] from x padded 8 left / 8 right,
        # kernel w2 [9, 2Ci, 2Co]: w2[m, 2c+j... ] — built from wp
        wpn = np.asarray(wp, np.float32)  # [16, Ci, 2Co]
        w2 = np.zeros((9, 2 * Ci, 2 * Co), np.float32)
        # out[u, co'] = sum_{k'=0..15} xp8[2u + k' + 1] wp[k', co']  (pad8: shift +1)
        # 2u + k' + 1 = 2(u + m) + j  ->  k' = 2m + j - 1
        for m in range(9):
            for j in range(2):
                kp = 2 * m + j - 1
                if 0 <= kp < 16:
                    w2[m, j * Ci:(j + 1) * Ci, :] = wpn[kp]
        w2 = jnp.asarray(w2, jnp.bfloat16)

        def conv_pair(x, w2=w2):
            xp = jnp.pad(x, ((0, 0), (8, 8), (0, 0)))
            xq = xp.reshape(B, (T + 16) // 2, 2 * Ci)
            return lax.conv_general_dilated(
                xq, w2, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))

        # verify forms agree
        r1 = np.asarray(conv_s1(x), np.float32).reshape(B, U, 2 * Co)[:2, :4]
        r2 = np.asarray(conv_s2p(x), np.float32)[:2, :4]
        r3 = np.asarray(conv_pair(x), np.float32)[:2, :4, :]
        # conv_s2p/conv_pair channel order: [phase0 Co, phase1 Co] vs
        # interleaved reshape of s1 -> compare via reassembly
        r2i = np.stack([r2[..., :Co], r2[..., Co:]], axis=-2).reshape(r1.shape)
        r3i = np.stack([r3[..., :Co], r3[..., Co:]], axis=-2).reshape(r1.shape)
        e2, e3 = np.abs(r1 - r2i).max(), np.abs(r1 - r3i).max()

        h2 = jax.random.normal(key, (B, U, 2 * Co), jnp.bfloat16)
        sc = jax.random.normal(key, (2 * Co,), jnp.bfloat16)

        def tail4d(h2, sc=sc):
            h4 = (h2 * sc).reshape(B, U, 2, Co)
            return jnp.max(jax.nn.relu(h4), axis=2)

        def tail3d(h2, sc=sc):
            h = jax.nn.relu(h2 * sc)
            return jnp.maximum(h[..., :Co], h[..., Co:])

        print(f"T={T} Ci={Ci} Co={Co}  (form err s2p {e2:.1e} pair {e3:.1e})")
        print(f"  conv_s1   {timed(conv_s1, x):7.2f} ms")
        print(f"  conv_s2p  {timed(conv_s2p, x):7.2f} ms")
        print(f"  conv_pair {timed(conv_pair, x):7.2f} ms")
        print(f"  tail4d    {timed(tail4d, h2):7.2f} ms")
        print(f"  tail3d    {timed(tail3d, h2):7.2f} ms")


if __name__ == "__main__":
    main()
