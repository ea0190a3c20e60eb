"""XLA backend-flag sweep for the headline int8 inference path.

The headline (xla_int8, bs 12288, ~139.9k rec/s) sits at the measured
per-layer ceilings (docs/ARCHITECTURE.md): early convs are lane-occupancy
bound, deep convs run near the int8 MXU rate.  The one knob never probed is
XLA's own backend flags.  This probe times the full bench-identical int8
forward (bench._build_int8 + bench._throughput) under candidate XLA_FLAGS
values, one subprocess per config (flags are read once at backend init).

Usage: python tools/probe_xla_flags.py            # sweep + table
       python tools/probe_xla_flags.py --one "<flags>" --bs 12288  # worker

Result (TPU v5e via the axon PJRT client, 2026-08-18): **negative — flag
tuning is unavailable on this backend.**  Every TPU-specific candidate
(`--xla_tpu_scoped_vmem_limit_kib`, `--xla_tpu_enable_latency_hiding_
scheduler`) dies at backend init with `Unknown flag in XLA_FLAGS`: the
client-side flag registry (XLA_FLAGS=--help) only carries generic
cpu/gpu/llvm flags — the TPU compiler runs on the axon server side, out of
reach of client env flags.  Default-flag int8 throughput reproduces the
bench headline (139.3k rec/s).  Revisit if the backend ever exposes a
compile-options channel.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CANDIDATES = [
    ("default", ""),
    # scoped-vmem budget steers fusion/pipelining depth; default is model-
    # dependent, sweep both directions
    ("vmem_49152", "--xla_tpu_scoped_vmem_limit_kib=49152"),
    ("vmem_98304", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("vmem_16384", "--xla_tpu_scoped_vmem_limit_kib=16384"),
    # latency-hiding scheduler (mostly collectives, but also reorders
    # copies/compute on a single chip)
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_one(flags, bs):
    import bench

    forward, variables = bench._build_int8()
    import jax
    import jax.numpy as jnp

    # bench-identical batch: synthesized on device, bf16 wire dtype
    # (bench.bench_inference uses a bf16 wire batch for the int8 path)
    batch = jax.block_until_ready(
        jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (bs, 5000, 12), jnp.bfloat16))())
    rps = bench._throughput(forward, variables, batch)
    print(json.dumps({"rps": rps}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true",
                    help="worker mode (flags arrive via XLA_FLAGS env)")
    ap.add_argument("--bs", type=int, default=12288)
    args = ap.parse_args()
    if args.one:
        return run_one(os.environ.get("XLA_FLAGS", ""), args.bs)

    rows = []
    for name, flags in CANDIDATES:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 "--bs", str(args.bs)],
                capture_output=True, text=True, timeout=600, env=env,
                cwd=HERE)
        except subprocess.TimeoutExpired:
            print(f"{name:>12}: TIMEOUT")
            continue
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            rps = json.loads(line)["rps"]
        except Exception:
            tail = (r.stderr or "").strip().splitlines()
            print(f"{name:>12}: FAILED ({tail[-1][:120] if tail else r.returncode})")
            continue
        rows.append((name, rps))
        print(f"{name:>12}: {rps:>10.1f} rec/s")
    if rows:
        base = dict(rows).get("default")
        print("\nvs default:")
        for name, rps in rows:
            print(f"{name:>12}: {rps / base - 1.0:+.2%}" if base else name)


if __name__ == "__main__":
    main()
