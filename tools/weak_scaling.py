"""Weak-scaling harness for the sharded prover.

Measures end-to-end prove_trace throughput (trace rows/s) at mesh sizes
1, 2, 4, 8 with the per-device trace size held constant (weak scaling):
mesh n proves a 2^(log_base + log2 n)-row trace.  Efficiency at n is
rate_n / (n * rate_1); the north-star target is > 80%.

On the dev machine the mesh is 8 virtual CPU devices
(xla_force_host_platform_device_count) — the standard JAX technique for
validating pjit/shard_map layouts without hardware; absolute rates are
CPU numbers, the *efficiency* column is the result.  On a real slice the
same script runs unchanged.

Usage:  python tools/weak_scaling.py [--log-base 11] [--trials 2]
Writes one JSON line per mesh size and a summary table to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("WEAK_SCALING_REAL_DEVICES"):
    jax.config.update("jax_platforms", "cpu")
from zkir_tpu.prover.constraints import cache_dir  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(cache_dir(), "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

from zkir_tpu.interp import InterpConfig, TpuInterpreter  # noqa: E402
from zkir_tpu.parallel import make_mesh  # noqa: E402
from zkir_tpu.prover import FriConfig, prove_trace, trace_to_matrix  # noqa: E402
from zkir_tpu.spec import Instruction, Op, Program  # noqa: E402

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4,
                grinding_bits=2, min_security=0)


def make_matrix(log_rows: int) -> np.ndarray:
    """A real executed trace of exactly 2^log_rows cycles."""
    from zkir_tpu.prover.benchtrace import exact_trace_matrix

    return exact_trace_matrix(log_rows)


def time_prove(matrix, mesh, trials):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        proof = prove_trace(matrix, CFG, mesh=mesh)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, proof


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-base", type=int, default=11,
                    help="log2 rows per device")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    virtual = not os.environ.get("WEAK_SCALING_REAL_DEVICES")

    # Sharding-overhead sweep: SAME problem size on growing meshes.  On
    # virtual CPU devices (one physical socket) this is the meaningful
    # number — weak-scaling "efficiency" there is bounded by 1/n because
    # n virtual devices share the same cores while total work grows.
    # The ideal overhead ratio is 1.0; anything above it is the cost of
    # XLA partitioning + collectives.
    fixed = make_matrix(args.log_base + 2)
    t1_fixed = None
    results = []
    for n_dev in args.sizes:
        dt, _ = time_prove(fixed, make_mesh(n_dev), args.trials)
        if n_dev == 1:
            t1_fixed = dt
        rec = {"mode": "fixed-size", "n_devices": n_dev,
               "rows": fixed.shape[0], "prove_s": round(dt, 3),
               "overhead_vs_1dev": round(dt / t1_fixed, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # Weak-scaling sweep (rows per device constant).  Efficiency is only
    # meaningful on real devices; on the virtual mesh it is reported with
    # its 1/n ceiling for reference.
    weak = []
    rate1 = None
    for n_dev in args.sizes:
        log_rows = args.log_base + (n_dev - 1).bit_length()
        matrix = make_matrix(log_rows)
        dt, _ = time_prove(matrix, make_mesh(n_dev), args.trials)
        rate = matrix.shape[0] / dt
        if n_dev == 1:
            rate1 = rate
        eff = rate / (n_dev * rate1) if rate1 else float("nan")
        rec = {"mode": "weak", "n_devices": n_dev, "rows": matrix.shape[0],
               "prove_s": round(dt, 3), "rows_per_s": round(rate),
               "efficiency": round(eff, 3)}
        if virtual:
            rec["note"] = ("virtual devices share one socket: the "
                           f"efficiency ceiling is 1/n = {1 / n_dev:.2f}")
        weak.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n  fixed-size sharding overhead (ideal 1.0):")
    print("  n_dev   prove_s   overhead")
    for r in results:
        print(f"  {r['n_devices']:5d}   {r['prove_s']:7.2f}"
              f"   {r['overhead_vs_1dev']:.2f}x")
    print("\n  weak scaling"
          + (" (VIRTUAL devices: ceiling 1/n)" if virtual else "") + ":")
    print("  n_dev   rows      prove_s   rows/s     efficiency")
    for r in weak:
        print(f"  {r['n_devices']:5d}   {r['rows']:7d}   {r['prove_s']:7.2f}"
              f"   {r['rows_per_s']:8d}   {r['efficiency']:.1%}")


if __name__ == "__main__":
    main()
