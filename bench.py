"""Benchmark entry point (run on real TPU hardware by the driver).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: batched trace-generation throughput (cycles/sec summed
over lanes) of the columnar interpreter on a fibonacci loop.  The reference
publishes no measured numbers (BASELINE.md); its own stated target is
>10M steps/sec (README.md:279), which we use as the baseline denominator.

Extra metrics: Poseidon2 permutations/sec/chip and 2^20 CM31 NTT time.
"""

from __future__ import annotations

import json
import sys
import time


def _time(fn, *args, iters=3, warmup=1):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_trace_gen(lanes=512, chunk=512, n_chunks=4):
    """Interpreter throughput: lanes x chunk cycles per chunk call."""
    import jax
    import jax.numpy as jnp

    from zkir_tpu.interp import InterpConfig, TpuInterpreter
    from zkir_tpu.spec import Instruction, Op, Program

    # Infinite arithmetic loop: add/addi/jal back — a representative mix
    # with no halting lanes.
    program = Program.from_instructions([
        Instruction(Op.ADDI, rd=1, rs1=0, imm=7),
        Instruction(Op.ADD, rd=2, rs1=2, rs2=1),
        Instruction(Op.MUL, rd=3, rs1=2, rs2=1),
        Instruction(Op.XOR, rd=4, rs1=3, rs2=2),
        Instruction(Op.SLT, rd=5, rs1=4, rs2=2),
        Instruction(Op.JAL, rd=0, imm=-20),
    ])
    config = InterpConfig(lanes=lanes, chunk=chunk,
                          low_bytes=1 << 15, stack_bytes=1 << 12)
    interp = TpuInterpreter(program, config)
    state = interp.init_state([[] for _ in range(lanes)])
    n_words = jnp.int32(interp.n_words)

    def run_chunks(state):
        for _ in range(n_chunks):
            state, _ = interp._chunk_fn(interp.code, n_words, state)
        return state

    elapsed = _time(run_chunks, state, iters=3, warmup=1)
    cycles = lanes * chunk * n_chunks
    return cycles / elapsed


def bench_poseidon2(log_batch=18, iters=8):
    """Chained permutations (each iteration consumes the previous output so
    calls cannot overlap or dedupe)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkir_tpu.ops.poseidon2 import poseidon2_permute_batch
    from zkir_tpu.spec.field import M31_PRIME

    n = 1 << log_batch
    states = jnp.asarray(
        np.random.default_rng(0).integers(0, M31_PRIME, (n, 16),
                                          dtype=np.uint32))
    states = jax.block_until_ready(poseidon2_permute_batch(states))  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        states = poseidon2_permute_batch(states)
    jax.block_until_ready(states)
    elapsed = (time.perf_counter() - t0) / iters
    return n / elapsed


def bench_ntt(log_n=20, iters=5):
    """Chained forward NTTs (output feeds the next input)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkir_tpu.ops.ntt import ntt
    from zkir_tpu.spec.field import M31_PRIME

    n = 1 << log_n
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32))
    im = jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32))
    re, im = jax.block_until_ready(ntt(re, im, log_n))  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        re, im = ntt(re, im, log_n)
    jax.block_until_ready((re, im))
    elapsed = (time.perf_counter() - t0) / iters
    return elapsed * 1e3  # ms


def main():
    extra = {}
    try:
        extra["poseidon2_perms_per_s"] = round(bench_poseidon2())
    except Exception as e:  # pragma: no cover
        extra["poseidon2_error"] = str(e)[:200]
    try:
        extra["ntt_2e20_ms"] = round(bench_ntt(), 2)
    except Exception as e:  # pragma: no cover
        extra["ntt_error"] = str(e)[:200]

    value = bench_trace_gen()
    baseline = 10e6  # reference's own stated target (README.md:279)
    print(json.dumps({
        "metric": "trace_gen_cycles_per_sec",
        "value": round(value),
        "unit": "cycles/s",
        "vs_baseline": round(value / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
