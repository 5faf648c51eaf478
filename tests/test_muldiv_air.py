"""MUL/MULH/DIV-family AIR tests: the shared 10-bit-chunk multiplier
chain pins res = a*b mod 2^40 (MUL), res = bits [40,80) of a*b (MULH),
and a = q*b + r with r < b for DIV/DIVU/REM/REMU (prover/constraints.py
multiply/divide block; semantics execute.rs:85-183 on the canonical
40-bit operand views)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import (
    COL_DR0, COL_OPCODE, COL_RES_CH0, COL_RES_LO, COL_REG_LO, COL_U0,
    COL_XQ0)
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)
COL_RES_HI = COL_RES_LO + 1


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _matrix_for(instrs, inputs=()):
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([list(inputs)])["trace"])


@pytest.fixture(scope="module")
def md_matrix():
    # Large operands so MULH and the carries are non-trivial:
    # r1 = 0xABCDE << 20 | 0x12345, r2 = 0x7FF07 << 16 | 0xBEEF.
    return _matrix_for([
        I(Op.ADDI, rd=1, rs1=0, imm=0xABCD),
        I(Op.SLLI, rd=1, rs1=1, imm=24),
        I(Op.ADDI, rd=2, rs1=0, imm=0x7FF0),
        I(Op.SLLI, rd=2, rs1=2, imm=13),
        I(Op.ADDI, rd=2, rs1=2, imm=0xBEEF),
        I(Op.ADDI, rd=1, rs1=1, imm=0x3451),
        I(Op.MUL, rd=3, rs1=1, rs2=2),
        I(Op.MULH, rd=4, rs1=1, rs2=2),
        I(Op.DIVU, rd=5, rs1=1, rs2=2),
        I(Op.REMU, rd=6, rs1=1, rs2=2),
        I(Op.DIV, rd=7, rs1=1, rs2=2),
        I(Op.REM, rd=8, rs1=1, rs2=2),
        I(Op.EBREAK),
    ])


def _row(m, opv):
    return int(np.nonzero(m[:, COL_OPCODE] == opv)[0][0])


def _forge_res(m, row, delta):
    """Tamper the committed result consistently through its chunk
    decomposition and the next-row register write, so only the semantic
    pin can catch it."""
    bad = m.copy()
    new_lo = (int(bad[row, COL_RES_LO]) + delta) % (1 << 20)
    bad[row, COL_RES_LO] = new_lo
    bad[row, COL_RES_CH0 + 0] = new_lo & 0x3FF
    bad[row, COL_RES_CH0 + 1] = new_lo >> 10
    rd = int(bad[row, 3])
    # Propagate the forged write into every later row until rewritten.
    for r in range(row + 1, bad.shape[0]):
        bad[r, COL_REG_LO + rd] = new_lo
        nxt_writes = int(bad[r, 3]) == rd
        if nxt_writes:
            break
    return bad


class TestMulDivAir:
    def test_honest_roundtrip(self, md_matrix):
        proof = prove_trace(md_matrix, CFG)
        assert verify_trace(proof)

    @pytest.mark.parametrize("opv", [0x02, 0x03, 0x04, 0x05, 0x06, 0x07])
    def test_forged_result_rejected(self, md_matrix, opv):
        row = _row(md_matrix, opv)
        bad = _forge_res(md_matrix, row, 1)
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_quotient_witness_rejected(self, md_matrix):
        # REMU commits q as a free witness (xq chunks); a wrong q that
        # still satisfies digit ranges must break a = q*b + r.
        row = _row(md_matrix, 0x05)
        bad = md_matrix.copy()
        bad[row, COL_XQ0] = (int(bad[row, COL_XQ0]) + 1) % 1024
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_remainder_ge_divisor_rejected(self, md_matrix):
        # Claim (q-1, r+b): still satisfies a = q*b + r but r >= b,
        # so the u = b - 1 - r chunks cannot exist in range.  Forge u
        # out of range too; with range_lookup off the u linear pin must
        # fire, so tamper only the dr/u/res side consistently.
        row = _row(md_matrix, 0x05)   # REMU: res = r
        m = md_matrix
        a = (int(m[row, COL_REG_LO + 1])
             | (int(m[row, COL_REG_LO + 17]) << 20))
        b = (int(m[row, COL_REG_LO + 2])
             | (int(m[row, COL_REG_LO + 18]) << 20))
        q, r = a // b, a % b
        q2, r2 = q - 1, r + b
        bad = m.copy()
        for i in range(4):
            bad[row, COL_XQ0 + i] = (q2 >> (10 * i)) & 0x3FF
            bad[row, COL_DR0 + i] = (r2 >> (10 * i)) & 0x3FF
        new_lo, new_hi = r2 & ((1 << 20) - 1), (r2 >> 20) & ((1 << 20) - 1)
        bad[row, COL_RES_LO] = new_lo
        bad[row, COL_RES_HI] = new_hi
        bad[row, COL_RES_CH0 + 0] = new_lo & 0x3FF
        bad[row, COL_RES_CH0 + 1] = new_lo >> 10
        bad[row, COL_RES_CH0 + 2] = new_hi & 0x3FF
        bad[row, COL_RES_CH0 + 3] = new_hi >> 10
        # u = b - 1 - r2 is negative; the closest in-field witness wraps.
        u2 = (b - 1 - r2) % (1 << 40)
        for i in range(4):
            bad[row, COL_U0 + i] = (u2 >> (10 * i)) & 0x3FF
        # Propagate the written value like an honest write would.
        rd = int(bad[row, 3])
        bad[row + 1:, COL_REG_LO + rd] = new_lo
        bad[row + 1:, COL_REG_LO + 16 + rd] = new_hi
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)
