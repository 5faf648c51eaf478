"""Benchmark entry point (run on real TPU hardware by the driver).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: batched trace-generation throughput (cycles/sec summed
over lanes) of the columnar interpreter.  The reference publishes no
measured numbers (BASELINE.md); its own stated target is >10M steps/sec
(README.md:279), used as the baseline denominator.

Timing methodology: each measurement is ONE device dispatch containing the
iterated computation (``lax.fori_loop`` / the interpreter's scan), timed on
*fresh* input after a separate warmup input — immune to dispatch-pipeline
and caching artifacts of the remote-TPU tunnel.
"""

from __future__ import annotations

import json
import os
import time


def _configure_cache():
    """Persistent XLA compilation cache + AOT quotient-kernel cache,
    both living under ``<repo>/.zkir_cache`` (NOT /tmp): the remote-TPU
    tunnel's compile round-trips dominate cold runs, and /tmp does not
    reliably survive from the builder session into the driver's
    fresh-process benchmark run — which is exactly what timed out the
    round-4 prove metric."""
    import jax

    from zkir_tpu.prover.constraints import cache_dir

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir(), "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _timed_single_dispatch(fn, warm_arg, fresh_arg, probe):
    """Time one dispatch, forcing completion with a host readback of a
    result scalar (``probe``) — block_until_ready alone does not reliably
    wait on the remote-TPU tunnel used in this environment."""
    probe(fn(warm_arg))
    t0 = time.perf_counter()
    out = fn(fresh_arg)
    probe(out)
    return time.perf_counter() - t0


def _slope_time(make_fn, work_small, work_big, warm_arg, fresh_arg, probe):
    """Throughput from the *difference* of two dispatch sizes, cancelling
    the tunnel's fixed dispatch + readback latency:
        rate = (work_big - work_small) / (t_big - t_small)."""
    fn_small = make_fn(work_small)
    fn_big = make_fn(work_big)
    t_small = _timed_single_dispatch(fn_small, warm_arg, fresh_arg, probe)
    t_big = _timed_single_dispatch(fn_big, warm_arg, fresh_arg, probe)
    if t_big <= t_small:
        return None  # noise dominated; caller falls back
    return (work_big - work_small) / (t_big - t_small)


def bench_trace_gen(lanes=None, chunk=512):
    """One scan dispatch = lanes x chunk machine cycles."""
    if lanes is None:
        lanes = int(os.environ.get("BENCH_TRACE_LANES", 65536))
    import jax.numpy as jnp

    from zkir_tpu.interp import InterpConfig, TpuInterpreter
    from zkir_tpu.spec import Instruction, Op, Program

    program = Program.from_instructions([
        Instruction(Op.ADDI, rd=1, rs1=0, imm=7),
        Instruction(Op.ADD, rd=2, rs1=2, rs2=1),
        Instruction(Op.MUL, rd=3, rs1=2, rs2=1),
        Instruction(Op.XOR, rd=4, rs1=3, rs2=2),
        Instruction(Op.SLT, rd=5, rs1=4, rs2=2),
        Instruction(Op.JAL, rd=0, imm=-20),
    ])
    config = InterpConfig(lanes=lanes, chunk=chunk,
                          low_bytes=1 << 13, stack_bytes=1 << 12)
    interp = TpuInterpreter(program, config)
    n_words = jnp.int32(interp.n_words)

    state_warm = interp.init_state([[] for _ in range(lanes)])
    state_fresh = interp.init_state([[1] for _ in range(lanes)])

    def make_fn(n_chunks):
        def run(state):
            for _ in range(n_chunks):
                state, _ = interp._chunk_fn(interp.code, n_words, state)
            return state
        return run

    # Work unit = machine cycles; make_fn takes a CHUNK COUNT, so divide
    # (1 chunk vs 3 chunks — r2 passed per_chunk itself here, dispatching
    # 4.2M chunks and timing out the whole benchmark).
    per_chunk = lanes * chunk
    rate = _slope_time(lambda w: make_fn(w // per_chunk),
                       per_chunk, 3 * per_chunk,
                       state_warm, state_fresh, lambda s: int(s.cycles[0]))
    if rate is None:
        elapsed = _timed_single_dispatch(
            make_fn(1), state_warm, state_fresh, lambda s: int(s.cycles[0]))
        rate = per_chunk / elapsed
    return rate


def bench_poseidon2(log_batch=20, iters=16):
    """One dispatch of `iters` chained permutations via fori_loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkir_tpu.ops.poseidon2 import poseidon2_permute_batch
    from zkir_tpu.spec.field import M31_PRIME

    n = 1 << log_batch

    def make_fn(k):
        @jax.jit
        def iterate(states):
            return jax.lax.fori_loop(
                0, k, lambda i, s: poseidon2_permute_batch(s), states)
        return lambda s: iterate(s)

    rng = np.random.default_rng(0)
    warm = jnp.asarray(rng.integers(0, M31_PRIME, (n, 16), dtype=np.uint32))
    fresh = jnp.asarray(rng.integers(0, M31_PRIME, (n, 16), dtype=np.uint32))
    rate = _slope_time(lambda k: make_fn(k // n), n * 2, n * 10,
                       warm, fresh, lambda s: int(s[0, 0]))
    if rate is None:
        elapsed = _timed_single_dispatch(make_fn(iters), warm, fresh,
                                         lambda s: int(s[0, 0]))
        rate = n * iters / elapsed
    return rate


def bench_ntt(log_n=24, iters=8):
    """One dispatch of `iters` chained NTTs via fori_loop.

    ONE compiled executable serves every iteration count: the trip count
    is a TRACED argument (fori_loop lowers it to a while_loop), so the
    four-step kernel's large mid-twiddle constants (2 x 4096 x 4096 u32
    at 2^24 — the r3 bench compiled and serialized them twice over the
    remote tunnel and timed out before ever measuring) are compiled and
    transferred exactly once, during the untimed warmup."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkir_tpu.ops.ntt import _ntt_core
    from zkir_tpu.spec.field import M31_PRIME

    n = 1 << log_n

    @jax.jit
    def iterate(arrs, k):
        def body(i, arrs):
            re, im = arrs
            return _ntt_core(re, im, log_n, inverse=False)
        return jax.lax.fori_loop(0, k, body, arrs)

    def make_fn(k):
        kk = jnp.int32(k)
        return lambda arrs: iterate(arrs, kk)

    rng = np.random.default_rng(1)
    warm = (jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32)))
    fresh = (jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32)),
             jnp.asarray(rng.integers(0, M31_PRIME, n, dtype=np.uint32)))
    rate = _slope_time(lambda k: make_fn(k), 2, 10,
                       warm, fresh, lambda arrs: int(arrs[0][0]))
    if rate is None:
        elapsed = _timed_single_dispatch(make_fn(iters), warm, fresh,
                                         lambda arrs: int(arrs[0][0]))
        rate = iters / elapsed
    return 1e3 / rate  # ms per 2^log_n NTT


def _partial(update: dict) -> None:
    """Progress breadcrumbs for the parent: merged into the headline
    JSON's ``extra`` even when this subprocess is later killed at its
    timeout — a timed-out prove still reports how far it got and the
    stage timings it measured (round-4 recorded nothing at all)."""
    path = os.environ.get("BENCH_PARTIAL")
    if not path:
        return
    import json as _json

    try:
        cur = {}
        try:
            with open(path) as f:
                cur = _json.load(f)
        except Exception:
            pass
        cur.update(update)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(cur, f)
        os.replace(tmp, path)
    except Exception:
        pass


def bench_prove(log_rows=None):
    """End-to-end prove throughput (trace rows/s): a real executed
    2^log_rows-cycle trace, proven with the production FriConfig
    (range lookup + memory argument + PoW grinding), verified once.

    The warm prove (kernel loading: AOT quotient cache + persistent XLA
    cache) and the timed prove run in THIS process; every stage writes a
    breadcrumb so a timeout still yields partial data."""
    from zkir_tpu.prover import FriConfig, prove_trace, verify_trace
    from zkir_tpu.prover.benchtrace import exact_trace_matrix

    if log_rows is None:
        log_rows = int(os.environ.get("BENCH_PROVE_LOG_ROWS", 16))
    t0 = time.perf_counter()
    matrix = exact_trace_matrix(log_rows)
    _partial({"prove_log_rows": log_rows,
              "prove_trace_build_s": round(time.perf_counter() - t0, 1)})

    cfg = FriConfig()  # production defaults: 32 queries + 16 grinding bits
    t0 = time.perf_counter()
    prove_trace(matrix, cfg, range_lookup=True)  # warm the kernels
    _partial({"prove_warm_s": round(time.perf_counter() - t0, 1)})
    t0 = time.perf_counter()
    proof = prove_trace(matrix, cfg, range_lookup=True)
    dt = time.perf_counter() - t0
    rate = matrix.shape[0] / dt
    _partial({"prove_s": round(dt, 2),
              "trace_rows_proved_per_s": round(rate)})
    t0 = time.perf_counter()
    assert verify_trace(proof)
    _partial({"verify_s": round(time.perf_counter() - t0, 1)})
    return rate


def _run_isolated(which: str, timeout_s: int = 420, env=None,
                  partials=None):
    """Run one sub-benchmark in a subprocess with a hard timeout (remote-TPU
    tunnels can wedge indefinitely on readbacks; the headline JSON line must
    still be printed).  ``partials``: a dict that receives the child's
    progress breadcrumbs (written to a side file) even on timeout."""
    import json as _json
    import pathlib
    import subprocess
    import sys
    import tempfile

    sub_env = dict(os.environ)
    if env:
        sub_env.update(env)
    pfile = None
    if partials is not None:
        pfile = tempfile.mktemp(prefix=f"bench_{which}_", suffix=".json")
        sub_env["BENCH_PARTIAL"] = pfile
    proc = subprocess.Popen(
        [sys.executable, str(pathlib.Path(__file__).resolve()),
         "--only", which],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=sub_env,
    )
    timed_out = False
    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.kill()
        try:
            # A child wedged in tunnel I/O can be unkillable for a while;
            # don't let its wait() stall the whole benchmark.
            proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            pass
        stdout = stderr = ""
    if pfile is not None:
        try:
            with open(pfile) as f:
                partials.update(_json.load(f))
            os.unlink(pfile)
        except Exception:
            pass
    if timed_out:
        return None, f"timeout after {timeout_s}s"
    for line in (stdout or "").splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1]), None
    return None, ((stderr or stdout) or "")[-200:]


def main():
    import sys

    if "--only" in sys.argv:
        which = sys.argv[sys.argv.index("--only") + 1]
        fn = {"trace": bench_trace_gen, "poseidon2": bench_poseidon2,
              "ntt": bench_ntt, "prove": bench_prove}[which]
        _configure_cache()
        print(f"RESULT {fn()}")
        return

    # Global wall-clock budget: the driver kills the whole benchmark at
    # its window; r2 burned it all on sub-benches and printed nothing.
    # Every sub-bench gets min(its own cap, time left - reserve) and the
    # JSON line always prints.
    start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    reserve = 30.0  # native bench + JSON print

    def time_left():
        return budget - (time.perf_counter() - start) - reserve

    def note(msg):
        import sys
        print(f"[bench {time.perf_counter() - start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    extra = {}

    # Headline FIRST: the TPU trace-generation rate.  Lanes ladder — the
    # tunnel's compile time scales with the program; when the big config
    # can't compile inside its cap, a smaller lane count still yields an
    # honest TPU number (labeled).  Throughput is not monotone in lane
    # count (546M/s at 8192 vs 429M/s at 65536 measured on v5e), so take
    # the best config that fits the budget.
    value = None
    err = "budget exhausted"
    for lanes, cap in ((8192, 300), (65536, 480)):
        t = min(cap, time_left())
        if t < 60:
            break
        v, e = _run_isolated("trace", timeout_s=int(t),
                             env={"BENCH_TRACE_LANES": str(lanes)})
        note(f"trace lanes={lanes}: {v} ({e})")
        if v is not None and (value is None or v > value):
            value, err = v, None
            extra["trace_lanes"] = lanes
        elif v is None and value is None:
            err = e
    if value is None:
        # Headline stays honest: report 0 with the error rather than
        # substituting the CPU engine's rate.
        value = 0.0
        extra["trace_note"] = f"tpu path unavailable ({err})"

    # The prove cap is the REST of the budget (not a fixed 420s): it is
    # the last TPU sub-bench, the earlier ones are cheap when cached,
    # and round 4's fixed cap is why the official prove metric went
    # missing.  Partial breadcrumbs land in extra either way.
    for which, key, cap, digits in (
            ("poseidon2", "poseidon2_perms_per_s", 180, 0),
            ("ntt", "ntt_2e24_ms", 180, 3),
            ("prove", "trace_rows_proved_per_s", 10**9, 0)):
        t = min(cap, time_left())
        if t < 60:
            extra[f"{which}_error"] = "budget exhausted"
            continue
        partials = {}
        val, err = _run_isolated(which, timeout_s=int(t),
                                 partials=partials)
        extra.update(partials)
        note(f"{which}: {val} ({err}) {partials}")
        if val is not None:
            extra[key] = round(val, digits) if digits else round(val)
        else:
            extra[f"{which}_error"] = err

    # The native C++ VM rate is always reported as its own metric — it is
    # a CPU number and must never masquerade as the TPU headline.
    try:
        extra["native_vm_cycles_per_sec"] = round(_native_fallback())
    except Exception as exc:  # pragma: no cover
        extra["native_vm_error"] = str(exc)[-120:]
    baseline = 10e6  # reference's own stated target (README.md:279)
    print(json.dumps({
        "metric": "tpu_trace_gen_cycles_per_sec",
        "value": round(value),
        "unit": "cycles/s",
        "vs_baseline": round(value / baseline, 3),
        "extra": extra,
    }))


def _native_fallback():
    from zkir_tpu.runtime.native_vm import run_native
    from zkir_tpu.spec import Instruction, Op, Program

    program = Program.from_instructions([
        Instruction(Op.ADDI, rd=1, rs1=0, imm=7),
        Instruction(Op.ADD, rd=2, rs1=2, rs2=1),
        Instruction(Op.XOR, rd=3, rs1=2, rs2=1),
        Instruction(Op.JAL, rd=0, imm=-8),
    ])
    n = 20_000_000
    t0 = time.perf_counter()
    run_native(program, [], max_cycles=n)
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
