"""Logical + shift family AIR tests.

Logic (AND/OR/XOR + immediates): one committed AND value c with 5-bit
chunk triples pinned by the challenge-compressed AND table
(prover/aux_table.py); OR = a + b - c and XOR = a + b - 2c pin the rest.
Shifts (SLL/SRL/SRA + immediates): y = 2^s_eff from the preprocessed
shift-power table rides the shared multiplier (SLL = low product;
SRL/SRA = division by y), with SRA's complement trick
sra(a, s) = ~srl(~a, s) on negative a.  Semantics:
execute.rs:147-165 (logic), :285-322 (shifts) on canonical 40-bit views.
"""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import (
    COL_LG_C0, COL_LG_C_LO, COL_OPCODE, COL_REG_LO, COL_RES_CH0,
    COL_RES_LO, COL_SH_PM, COL_XQ0, COL_YQ0)
from zkir_tpu.prover.fri import FriConfig

from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)
CFG_L = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2, min_security=0)

LOGIC_OPS = (0x10, 0x11, 0x12, 0x13, 0x14, 0x15)
SHIFT_OPS = (0x18, 0x19, 0x1A, 0x1B, 0x1C, 0x1D)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


PROGRAM = [
    # r1 = large 40-bit pattern with the sign bit SET, r2 = another.
    I(Op.ADDI, rd=1, rs1=0, imm=0xABCD),
    I(Op.SLLI, rd=1, rs1=1, imm=26),
    I(Op.ADDI, rd=1, rs1=1, imm=0x2345),
    I(Op.ADDI, rd=2, rs1=0, imm=0x5A5A),
    I(Op.SLLI, rd=2, rs1=2, imm=17),
    I(Op.ADDI, rd=2, rs1=2, imm=0x0F0F),
    # Logical family, register + immediate (negative imm sign-extends).
    I(Op.AND, rd=3, rs1=1, rs2=2),
    I(Op.OR, rd=4, rs1=1, rs2=2),
    I(Op.XOR, rd=5, rs1=1, rs2=2),
    I(Op.ANDI, rd=6, rs1=1, imm=-0x1234),
    I(Op.ORI, rd=7, rs1=1, imm=0x0FF0),
    I(Op.XORI, rd=8, rs1=1, imm=-1),
    # Shifts: register shamt masked mod 64 (r9 = 0x47 -> 7), an
    # in-width shamt, one >= 40, and SRA on the negative r1.
    I(Op.ADDI, rd=9, rs1=0, imm=0x47),
    I(Op.SLL, rd=10, rs1=1, rs2=9),
    I(Op.ADDI, rd=9, rs1=0, imm=33),
    I(Op.SRL, rd=11, rs1=1, rs2=9),
    I(Op.SRA, rd=12, rs1=1, rs2=9),
    I(Op.ADDI, rd=9, rs1=0, imm=45),
    I(Op.SRA, rd=13, rs1=1, rs2=9),    # shift >= 40: full sign fill
    I(Op.SLLI, rd=14, rs1=2, imm=11),
    I(Op.SRLI, rd=15, rs1=2, imm=44),  # >= 40: zero
    I(Op.SRAI, rd=14, rs1=1, imm=3),
    I(Op.EBREAK),
]


@pytest.fixture(scope="module")
def ls_matrix():
    interp = TpuInterpreter(Program.from_instructions(PROGRAM),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"])


def _rows(m, opv):
    return [int(r) for r in np.nonzero(m[:, COL_OPCODE] == opv)[0]]


def _forge_res(m, row, delta):
    """Tamper the committed result consistently through its chunk
    decomposition and the register file, so only the semantic pin or a
    table lookup can catch it."""
    bad = m.copy()
    new_lo = (int(bad[row, COL_RES_LO]) + delta) % (1 << 20)
    bad[row, COL_RES_LO] = new_lo
    bad[row, COL_RES_CH0 + 0] = new_lo & 0x3FF
    bad[row, COL_RES_CH0 + 1] = new_lo >> 10
    rd = int(bad[row, 3])
    for r in range(row + 1, bad.shape[0]):
        bad[r, COL_REG_LO + rd] = new_lo
        if int(bad[r, 3]) == rd:
            break
    return bad


class TestSemanticsVsOracle:
    def test_final_registers_match_oracle(self):
        """The device trace the matrix is built from agrees with the
        scalar oracle on every logic/shift result."""
        from zkir_tpu.runtime import VM
        vm = VM(Program.from_instructions(PROGRAM), [])
        vm.run()
        interp = TpuInterpreter(Program.from_instructions(PROGRAM),
                                InterpConfig(lanes=1, chunk=64))
        dev = interp.run([[]])
        for r in range(16):
            assert int(np.asarray(dev["regs"])[0, r]) \
                == vm.state.regs[r], f"r{r}"


class TestLogicShiftAir:
    def test_honest_roundtrip(self, ls_matrix):
        proof = prove_trace(ls_matrix, CFG)
        assert verify_trace(proof)

    def test_honest_roundtrip_with_lookup(self, ls_matrix):
        proof = prove_trace(ls_matrix, CFG_L, range_lookup=True)
        assert verify_trace(proof)

    @pytest.mark.parametrize("opv", LOGIC_OPS + SHIFT_OPS)
    def test_forged_result_rejected(self, ls_matrix, opv):
        row = _rows(ls_matrix, opv)[-1]
        bad = _forge_res(ls_matrix, row, 1)
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_sra_signfill_forged_rejected(self, ls_matrix):
        # The shift-45 SRA row: result must be the full sign fill.
        row = _rows(ls_matrix, 0x1A)[-1]
        bad = _forge_res(ls_matrix, row, -1)
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_and_chunk_rejected_by_table(self, ls_matrix):
        # Flip one bit of one AND chunk and keep EVERYTHING else linear-
        # consistent (c limb, res, res chunks, register propagation):
        # only the AND-table membership can catch it.
        row = _rows(ls_matrix, 0x10)[0]
        bad = ls_matrix.copy()
        c0 = int(bad[row, COL_LG_C0])
        bad[row, COL_LG_C0] = c0 ^ 1
        delta = (c0 ^ 1) - c0
        new_clo = (int(bad[row, COL_LG_C_LO]) + delta) % (1 << 20)
        bad[row, COL_LG_C_LO] = new_clo
        bad[row, COL_RES_LO] = new_clo
        bad[row, COL_RES_CH0 + 0] = new_clo & 0x3FF
        bad[row, COL_RES_CH0 + 1] = new_clo >> 10
        rd = int(bad[row, 3])
        for r in range(row + 1, bad.shape[0]):
            bad[r, COL_REG_LO + rd] = new_clo
            if int(bad[r, 3]) == rd:
                break
        proof = prove_trace(bad, CFG_L, range_lookup=True, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_shift_power_rejected_by_table(self, ls_matrix):
        # Claim y = 2*(2^s) on the SRAI row with every linear identity
        # kept consistent is impossible without moving pm off the table
        # row: tampering (pm, yq) alone must be caught by the shift
        # table or the division identity.
        row = _rows(ls_matrix, 0x1D)[0]
        bad = ls_matrix.copy()
        pm = int(bad[row, COL_SH_PM])
        bad[row, COL_SH_PM] = pm * 2
        d = next(i for i in range(4) if int(bad[row, COL_YQ0 + i]))
        bad[row, COL_YQ0 + d] = int(bad[row, COL_YQ0 + d]) * 2
        proof = prove_trace(bad, CFG_L, range_lookup=True, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_srl_quotient_rejected(self, ls_matrix):
        # SRL result = the committed quotient xq; an off-by-one quotient
        # breaks xd = q*y + r with r < y.
        row = _rows(ls_matrix, 0x19)[0]
        bad = ls_matrix.copy()
        bad[row, COL_XQ0] = (int(bad[row, COL_XQ0]) + 1) % 1024
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)
