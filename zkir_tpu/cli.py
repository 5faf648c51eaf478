"""Command-line toolchain: assemble, disassemble, run, prove, verify.

(The reference workspace declares a CLI crate but ships none —
``Cargo.toml:8`` comments it out; this module provides the working
equivalent.)

Usage:
    python -m zkir_tpu asm program.zkasm -o program.zkir
    python -m zkir_tpu disasm program.zkir
    python -m zkir_tpu run program.zkir --input 5 --engine native
    python -m zkir_tpu prove program.zkir --input 5 -o proof.json
    python -m zkir_tpu verify proof.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def _load_program(path: str):
    from .asm import assemble
    from .spec import Program

    p = pathlib.Path(path)
    if p.suffix == ".zkasm":
        return assemble(p.read_text())
    return Program.from_bytes(p.read_bytes())


def cmd_asm(args) -> int:
    from .asm import assemble

    program = assemble(pathlib.Path(args.source).read_text())
    out = args.output or str(pathlib.Path(args.source).with_suffix(".zkir"))
    pathlib.Path(out).write_bytes(program.to_bytes())
    print(f"assembled {len(program.code)} instructions -> {out}")
    return 0


def cmd_disasm(args) -> int:
    from .asm import disassemble

    print(disassemble(_load_program(args.binary)), end="")
    return 0


def cmd_run(args) -> int:
    program = _load_program(args.binary)
    inputs = [int(x, 0) for x in args.input]

    if args.engine == "native":
        from .runtime.native_vm import HALT_EXIT, run_native

        result = run_native(program, inputs, max_cycles=args.max_cycles)
        print(f"halt={result.halt} cycles={result.cycles} "
              f"exit={result.exit_code} outputs={result.outputs}")
        return 0 if result.halt in (1, HALT_EXIT) else 1
    if args.engine == "tpu":
        from .interp import InterpConfig, TpuInterpreter

        interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=256))
        result = interp.run([inputs], max_cycles=args.max_cycles)
        print(f"halt={int(result['halted'][0])} "
              f"cycles={int(result['cycles'][0])} "
              f"exit={int(result['exit_code'][0])} "
              f"outputs={[int(x) for x in result['outputs'][0]]}")
        return 0
    # oracle
    from .runtime import VM, VMConfig

    result = VM(program, inputs, VMConfig(max_cycles=args.max_cycles)).run()
    print(f"halt={result.halt_reason.reason.value} cycles={result.cycles} "
          f"exit={result.halt_reason.code} outputs={result.outputs}")
    return 0


def cmd_prove(args) -> int:
    from .interp import InterpConfig, TpuInterpreter
    from .prover import prove_trace, trace_to_matrix

    _configure_caches()
    program = _load_program(args.binary)
    inputs = [int(x, 0) for x in args.input]
    interp = TpuInterpreter(program, InterpConfig(
        lanes=1, chunk=256, collect_trace=True))
    result = interp.run([inputs], max_cycles=args.max_cycles)
    matrix = trace_to_matrix(result["trace"], program=program)
    mesh = None
    if args.mesh:
        from .parallel import make_mesh

        mesh = make_mesh(args.mesh)
    if args.streaming:
        # Column-streaming prover: bounded HBM (O(col_block x domain)),
        # bit-identical proof; always the full constraint set.
        from .prover.streaming import prove_trace_streaming

        proof = prove_trace_streaming(
            matrix, program=program if args.bind else None,
            col_block=args.col_block, mesh=mesh)
    elif args.bind:
        proof = prove_trace(matrix, range_lookup=True, program=program,
                            mesh=mesh, checkpoint_dir=args.checkpoint_dir)
    else:
        proof = prove_trace(matrix, mesh=mesh,
                            checkpoint_dir=args.checkpoint_dir)
    import dataclasses as _dc
    proof["fri"]["config"] = _dc.asdict(proof["fri"]["config"])
    out = args.output or "proof.json"
    pathlib.Path(out).write_text(json.dumps(proof))
    print(f"proved {matrix.shape[0]} trace rows "
          f"({int(result['cycles'][0])} cycles) -> {out}")
    return 0


def cmd_warm(args) -> int:
    """Pre-populate the persistent caches for a prove shape: run one
    full prove of a synthetic trace of the given size.  A cold machine
    pays the quotient sub-kernel compiles here, in parallel, AND
    serializes the traced+lowered quotient part kernels (AOT export) —
    every later fresh-process prove of a 2^log-rows trace skips both
    the XLA compiles and the ~336k-eqn term-graph retrace."""
    import time

    from .prover import FriConfig, prove_trace, verify_trace
    from .prover.benchtrace import exact_trace_matrix

    _configure_caches(args.cache_dir)
    t0 = time.perf_counter()
    matrix = exact_trace_matrix(args.log_rows)
    if args.streaming:
        from .prover.streaming import prove_trace_streaming

        proof = prove_trace_streaming(matrix, FriConfig(),
                                      col_block=args.col_block)
    else:
        proof = prove_trace(matrix, FriConfig(), range_lookup=True)
    assert verify_trace(proof)
    print(f"warmed prove kernels for 2^{args.log_rows} rows in "
          f"{time.perf_counter() - t0:.1f}s")
    return 0


def _configure_caches(cache_dir=None) -> None:
    import os

    import jax

    from .prover.constraints import cache_dir as default_dir

    if cache_dir:
        os.environ["ZKIR_CACHE_DIR"] = cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_dir or default_dir(), "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def cmd_verify(args) -> int:
    from .prover import verify_trace
    from .prover.fri import FriConfig

    proof = json.loads(pathlib.Path(args.proof).read_text())
    proof["fri"]["config"] = FriConfig(**proof["fri"]["config"])
    program = _load_program(args.binary) if args.binary else None
    if proof.get("program") and program is None:
        print("error: program-bound proof requires the public program "
              "(pass --binary); the memory argument's init demand is "
              "recomputed from its code/data segments")
        return 1
    ok = verify_trace(proof, program=program)
    print("VALID" if ok else "INVALID")
    return 0 if ok else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="zkir_tpu")
    parser.add_argument("--platform", choices=["auto", "cpu"],
                        default="auto",
                        help="force the JAX platform (cpu avoids attaching "
                             "to a TPU for host-side workflows)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("asm", help="assemble .zkasm to a .zkir binary")
    p.add_argument("source")
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_asm)

    p = sub.add_parser("disasm", help="disassemble a .zkir binary")
    p.add_argument("binary")
    p.set_defaults(fn=cmd_disasm)

    p = sub.add_parser("run", help="execute a program")
    p.add_argument("binary")
    p.add_argument("--input", action="append", default=[],
                   help="input tape value (repeatable)")
    p.add_argument("--engine", choices=["oracle", "native", "tpu"],
                   default="native")
    p.add_argument("--max-cycles", type=int, default=1_000_000)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("prove", help="execute + prove the trace")
    p.add_argument("binary")
    p.add_argument("--input", action="append", default=[])
    p.add_argument("--max-cycles", type=int, default=100_000)
    p.add_argument("--bind", action="store_true",
                   help="full soundness: in-circuit range lookups + "
                        "program binding (pads the trace to >= 1024 rows)")
    p.add_argument("--checkpoint-dir",
                   help="persist per-stage prove artifacts here; a killed "
                        "prove rerun with the same inputs resumes past "
                        "completed stages (bit-identical proof)")
    p.add_argument("--streaming", action="store_true",
                   help="column-streaming prover: peak HBM bounded by "
                        "O(col-block x domain); bit-identical proof, "
                        "always the full constraint set")
    p.add_argument("--col-block", type=int, default=64,
                   help="streaming column block size (default 64)")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard the prove over an N-device mesh "
                        "(composes with --streaming)")
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_prove)

    p = sub.add_parser("warm", help="pre-compile prover kernels for a "
                                    "trace size (persistent cache)")
    p.add_argument("--log-rows", type=int, default=13)
    p.add_argument("--cache-dir")
    p.add_argument("--streaming", action="store_true",
                   help="warm the streaming prover's kernels instead")
    p.add_argument("--col-block", type=int, default=64)
    p.set_defaults(fn=cmd_warm)

    p = sub.add_parser("verify", help="verify a proof")
    p.add_argument("proof")
    p.add_argument("--binary",
                   help="the public program; required to pin a "
                        "program-bound proof to it")
    p.set_defaults(fn=cmd_verify)

    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
