"""Program-binding AIR tests: every trace row's (pc, instruction-field)
tuple is LogUp-bound to the preprocessed public-program table, and the
first row is pinned to the entry point (prover/constraints.py program
channel; prover/prover.py preprocess_program)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import (preprocess_program, prove_trace,
                             trace_to_matrix, verify_trace)
from zkir_tpu.prover.constraints import (
    COL_IMM_LO,
    COL_IMM_Q0,
    COL_IMM_Q0HI,
    COL_IMM_Q1,
    COL_OPCODE,
    COL_RS2,
    COL_RS2H0,
)
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


@pytest.fixture(scope="module")
def bound_case():
    instrs = [I(Op.ADDI, rd=1, rs1=0, imm=1000),
              I(Op.ADDI, rd=2, rs1=0, imm=7)]
    for _ in range(8):
        instrs += [I(Op.ADD, rd=1, rs1=1, rs2=1),
                   I(Op.MUL, rd=3, rs1=1, rs2=2)]
    instrs += [I(Op.SW, rs1=0, rs2=3, imm=0x2000), I(Op.EBREAK)]
    program = Program.from_instructions(instrs)
    interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=64,
                                                  collect_trace=True))
    matrix = trace_to_matrix(interp.run([[]])["trace"])
    return program, matrix


class TestProgramBinding:
    def test_roundtrip(self, bound_case):
        program, matrix = bound_case
        proof = prove_trace(matrix, CFG, range_lookup=True, program=program)
        assert proof["program"]["entry"] == program.header.entry_point
        assert verify_trace(proof, program=program)
        # A bound proof REQUIRES the public program at verify time: the
        # memory argument's init demand (code/data cells) is recomputed
        # from it, so verification without the program fails closed.
        assert not verify_trace(proof)

    def test_wrong_program_rejected(self, bound_case):
        program, matrix = bound_case
        proof = prove_trace(matrix, CFG, range_lookup=True, program=program)
        other = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=1), I(Op.EBREAK)])
        assert not verify_trace(proof, program=other)

    def test_unbound_proof_rejected_when_program_required(self, bound_case):
        program, matrix = bound_case
        proof = prove_trace(matrix, CFG, range_lookup=True)
        assert not verify_trace(proof, program=program)

    def test_forged_immediate_rejected(self, bound_case):
        # A fully self-consistent immediate forgery (decomposition, rs2
        # field AND its one-hot all re-derived) on a store row: only the
        # program table can catch it.
        program, matrix = bound_case
        bad = matrix.copy()
        row = int(np.nonzero(bad[:, COL_OPCODE] == int(Op.SW))[0][0])
        imm = int(bad[row, COL_IMM_LO]) + 16   # keeps rs2 bits unchanged
        bad[row, COL_IMM_LO] = imm
        bad[row, COL_IMM_Q0] = imm & 0x3FF
        bad[row, COL_IMM_Q1] = (imm >> 10) & 0x3F
        bad[row, COL_IMM_Q0HI] = (imm >> 4) & 0x3F
        assert bad[row, COL_RS2] == imm & 0xF
        proof = prove_trace(bad, CFG, range_lookup=True, program=program, selfcheck=False)
        assert not verify_trace(proof, program=program)

    def test_forged_pc_rejected(self, bound_case):
        # Shifting every pc by 4 keeps the pc chain intact; the entry
        # constraint and the table tuples both break.
        program, matrix = bound_case
        bad = matrix.copy()
        bad[:, 0] += 4
        proof = prove_trace(bad, CFG, range_lookup=True, program=program, selfcheck=False)
        assert not verify_trace(proof, program=program)

    def test_preprocess_deterministic(self, bound_case):
        program, _ = bound_case
        r1 = preprocess_program(list(program.code), 10, CFG)["root"]
        r2 = preprocess_program(list(program.code), 10, CFG)["root"]
        assert r1 == r2
        r3 = preprocess_program(list(program.code)[:-1], 10, CFG)["root"]
        assert r1 != r3
