"""The shipped example programs assemble, run on all three engines,
and prove.

The reference ships `examples/add.zkasm` and `examples/fibonacci.zkasm`
in stale v2.2 syntax that its own v3.4 assembler rejects (SURVEY §0);
this repo's promise is the *working* v3.4 equivalents.
"""

import pathlib

import pytest

from zkir_tpu.asm import assemble
from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import FriConfig, prove_trace, trace_to_matrix, \
    verify_trace
from zkir_tpu.runtime import HaltReason
from zkir_tpu.runtime import native_vm
from zkir_tpu.runtime.vm import run

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def load(name):
    return assemble((EXAMPLES / name).read_text())


class TestAddExample:
    def test_assembles(self):
        program = load("add.zkasm")
        assert len(program.code) == 11

    @pytest.mark.parametrize("a,b", [(0, 0), (2, 3), (1000000, 2345678),
                                     ((1 << 40) - 1, 1)])
    def test_oracle(self, a, b):
        result = run(load("add.zkasm"), [a, b])
        assert result.outputs == [(a + b) & ((1 << 40) - 1)]
        assert result.halt_reason.reason is HaltReason.EXIT
        assert result.halt_reason.code == 0

    def test_native(self):
        if not native_vm.available():
            pytest.skip("native VM not built")
        nat = native_vm.run_native(load("add.zkasm"), [17, 25])
        assert nat.outputs == [42]

    def test_tpu(self):
        program = load("add.zkasm")
        interp = TpuInterpreter(program, InterpConfig(lanes=2, chunk=16))
        device = interp.run([[17, 25], [100, 200]])
        assert int(device["outputs"][0][0]) == 42
        assert int(device["outputs"][1][0]) == 300

    def test_prove_verify(self):
        program = load("add.zkasm")
        interp = TpuInterpreter(program, InterpConfig(
            lanes=1, chunk=16, collect_trace=True))
        result = interp.run([[17, 25]])
        matrix = trace_to_matrix(result["trace"])
        proof = prove_trace(matrix,
                            FriConfig(log_blowup=2, log_final=3,
                                      num_queries=6, grinding_bits=2,
                                      min_security=0))
        assert verify_trace(proof)


class TestFibonacciExample:
    def test_tpu_matches_closed_form(self):
        program = load("fibonacci.zkasm")
        interp = TpuInterpreter(program, InterpConfig(lanes=3, chunk=64))
        device = interp.run([[5], [10], [20]])
        assert [int(device["outputs"][i][0]) for i in range(3)] \
            == [5, 55, 6765]
