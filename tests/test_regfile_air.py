"""Opcode-decode binding + register-file write-consistency AIR tests.

The trace matrix commits the canonical register *value* view (see
prover/trace.py), so deferred-model normalization is invisible and the
AIR can require that between consecutive rows only the written register
changes (ECALL rows exempt).  These tests check the design assumption
against the real interpreter and the constraints against forgeries.
"""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import (
    COL_IMM_LO,
    COL_OPCODE,
    COL_RD,
    COL_RD1H0,
    COL_REG_HI,
    COL_REG_LO,
    COL_RES_HI,
    COL_RES_LO,
    COL_RS2,
    COL_SEL0,
    WRITING_OPS,
)
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.trace import N_OPS, OP_VALUES
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _matrix_for(instrs, inputs=()):
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    result = interp.run([list(inputs)])
    return trace_to_matrix(result["trace"])


@pytest.fixture(scope="module")
def mixed_matrix():
    # Deferred adds (normalization at the MUL observation point), a store,
    # a branch, and a syscall: every register-consistency case in one go.
    instrs = [
        I(Op.ADDI, rd=1, rs1=0, imm=1000),
        I(Op.ADDI, rd=2, rs1=0, imm=7),
        I(Op.ADD, rd=1, rs1=1, rs2=1),     # deferred accumulate
        I(Op.ADD, rd=1, rs1=1, rs2=2),
        I(Op.MUL, rd=3, rs1=1, rs2=2),     # observation point: normalizes r1
        I(Op.SW, rs1=0, rs2=3, imm=0x2000),
        I(Op.BEQ, rs1=0, rs2=0, imm=8),    # taken branch (skip next)
        I(Op.ADDI, rd=4, rs1=0, imm=99),   # skipped
        I(Op.ADDI, rd=11, rs1=0, imm=5),
        I(Op.ECALL),                       # SYS_EXIT (R10 = 0)
    ]
    return _matrix_for(instrs)


def _allowed_change_set(row):
    """Registers allowed to change after this row per the AIR."""
    op = int(row[COL_OPCODE])
    if op == 0x50:
        return {10}  # syscall result register only
    if op in WRITING_OPS:
        return {int(row[COL_RD])}
    return set()


class TestValueViewInvariant:
    def test_only_written_register_changes(self, mixed_matrix):
        m = mixed_matrix
        for k in range(len(m) - 1):
            lo = np.nonzero(m[k + 1, COL_REG_LO:COL_REG_LO + 16]
                            != m[k, COL_REG_LO:COL_REG_LO + 16])[0]
            hi = np.nonzero(m[k + 1, COL_REG_HI:COL_REG_HI + 16]
                            != m[k, COL_REG_HI:COL_REG_HI + 16])[0]
            changed = set(lo.tolist()) | set(hi.tolist())
            assert changed <= _allowed_change_set(m[k]), \
                f"row {k} (op {m[k, COL_OPCODE]:#x}) changed {changed}"

    def test_first_row_registers_zero(self, mixed_matrix):
        assert not mixed_matrix[0, COL_REG_LO:COL_REG_LO + 32].any()

    def test_selector_blocks_valid(self, mixed_matrix):
        m = mixed_matrix
        sel = m[:, COL_SEL0:COL_SEL0 + N_OPS]
        assert (sel.sum(axis=1) == 1).all()
        codes = np.asarray(OP_VALUES, dtype=np.uint32)
        np.testing.assert_array_equal(sel @ codes, m[:, COL_OPCODE])
        rd1h = m[:, COL_RD1H0:COL_RD1H0 + 16]
        assert (rd1h.sum(axis=1) == 1).all()
        np.testing.assert_array_equal(
            rd1h @ np.arange(16, dtype=np.uint32), m[:, COL_RD])


class TestRegfileProof:
    def test_roundtrip(self, mixed_matrix):
        proof = prove_trace(mixed_matrix, CFG)
        assert verify_trace(proof)

    def test_unwritten_register_change_rejected(self, mixed_matrix):
        bad = mixed_matrix.copy()
        # Row 0 is ADDI rd=1: r5 must not change into row 1.
        bad[1:, COL_REG_LO + 5] = 77
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_nonzero_initial_register_rejected(self, mixed_matrix):
        bad = mixed_matrix.copy()
        bad[0, COL_REG_LO + 7] = 1
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_invalid_opcode_rejected(self, mixed_matrix):
        bad = mixed_matrix.copy()
        bad[2, COL_OPCODE] = 0x09  # not a valid opcode
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_rd_field_rejected(self, mixed_matrix):
        # Changing rd without its one-hot breaks the binding; changing
        # both lets the prover "write" a different register — but then
        # the actually-changed register is unwritten -> rejected.
        bad = mixed_matrix.copy()
        bad[0, COL_RD] = 2
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

        bad2 = mixed_matrix.copy()
        bad2[0, COL_RD] = 2
        bad2[0, COL_RD1H0 + 1] = 0
        bad2[0, COL_RD1H0 + 2] = 1
        proof2 = prove_trace(bad2, CFG, selfcheck=False)
        assert not verify_trace(proof2)

    def test_read_syscall_r10_change_allowed(self):
        # SYS_READ pops the input tape into R10: an ECALL row whose R10
        # changes must still prove.
        m = _matrix_for([
            I(Op.ADDI, rd=10, rs1=0, imm=1),   # R10 = SYS_READ
            I(Op.ECALL),                       # R10 <- 42
            I(Op.ADDI, rd=10, rs1=0, imm=0),   # R10 = SYS_EXIT
            I(Op.ECALL),
        ], inputs=[42])
        proof = prove_trace(m, CFG)
        assert verify_trace(proof)

    def test_ecall_non_r10_change_rejected(self):
        # The ECALL exemption covers R10 only: forging another register's
        # value across a syscall row must fail.
        m = _matrix_for([
            I(Op.ADDI, rd=10, rs1=0, imm=1),
            I(Op.ECALL),                       # READ; has a successor row
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ECALL),
        ], inputs=[42])
        row = np.nonzero(m[:, COL_OPCODE] == 0x50)[0][0]
        bad = m.copy()
        bad[row + 1:, COL_REG_LO + 7] = 33
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_selector_block_rejected(self, mixed_matrix):
        # Claiming a store executed as a write (swap sel to ADD) breaks
        # the weighted-sum decode binding.
        bad = mixed_matrix.copy()
        row = np.nonzero(bad[:, COL_OPCODE] == int(Op.SW))[0][0]
        bad[row, COL_SEL0 + OP_VALUES.index(int(Op.SW))] = 0
        bad[row, COL_SEL0 + OP_VALUES.index(int(Op.ADD))] = 1
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)


@pytest.fixture(scope="module")
def alu_matrix():
    # Negative immediates, a wrapping SUB, deferred adds, and a JAL link
    # register: every pinned-result family in one trace.
    return _matrix_for([
        I(Op.ADDI, rd=1, rs1=0, imm=-5),
        I(Op.ADDI, rd=2, rs1=0, imm=7),
        I(Op.ADD, rd=3, rs1=1, rs2=2),
        I(Op.SUB, rd=4, rs1=2, rs2=1),     # 7 - (2^40 - 5) wraps
        I(Op.JAL, rd=5, imm=4),            # link = pc + 4
        I(Op.MUL, rd=6, rs1=3, rs2=2),     # unpinned writer
        I(Op.EBREAK),
    ])


class TestAluResultBinding:
    """The written value of ADD/SUB/ADDI/JAL(R) is pinned to its operands
    (prover/constraints.py result pins + result-binding transitions)."""

    def _forge_written(self, matrix, op):
        bad = matrix.copy()
        row = int(np.nonzero(bad[:, COL_OPCODE] == int(op))[0][0])
        rd = int(bad[row, COL_RD])
        bad[row + 1:, COL_REG_LO + rd] = \
            (bad[row + 1, COL_REG_LO + rd] + 1) % (1 << 20)
        return bad

    def test_honest_roundtrip(self, alu_matrix):
        proof = prove_trace(alu_matrix, CFG)
        assert verify_trace(proof)

    @pytest.mark.parametrize("op", [Op.ADD, Op.SUB, Op.ADDI, Op.JAL])
    def test_forged_result_rejected(self, alu_matrix, op):
        proof = prove_trace(self._forge_written(alu_matrix, op), CFG,
                            selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_result_with_res_columns_rejected(self, alu_matrix):
        # Forging the written register AND the committed res limbs breaks
        # the op-specific pin instead of the binding transition.
        bad = self._forge_written(alu_matrix, Op.ADD)
        row = int(np.nonzero(bad[:, COL_OPCODE] == int(Op.ADD))[0][0])
        rd = int(bad[row, COL_RD])
        bad[row, COL_RES_LO] = bad[row + 1, COL_REG_LO + rd]
        bad[row, COL_RES_HI] = bad[row + 1, COL_REG_HI + rd]
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_unpinned_writer_rejected(self, alu_matrix):
        # MUL has no semantic pin yet, but its written value is still
        # bound to the committed res columns.
        proof = prove_trace(self._forge_written(alu_matrix, Op.MUL), CFG,
                            selfcheck=False)
        assert not verify_trace(proof)

    def test_rs2_imm_overlap_pinned(self, alu_matrix):
        # rs2 is a bitfield of the immediate: forging rs2 alone breaks
        # the q0 = rs2 + 16*q0hi decomposition.
        bad = alu_matrix.copy()
        row = int(np.nonzero(bad[:, COL_OPCODE] == int(Op.ADD))[0][0])
        bad[row, COL_RS2] = (bad[row, COL_RS2] + 1) % 16
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_imm_rejected(self, alu_matrix):
        # The ADDI pin reads the committed immediate: changing it without
        # re-deriving the result must fail (decomposition or pin).
        bad = alu_matrix.copy()
        row = int(np.nonzero(bad[:, COL_OPCODE] == int(Op.ADDI))[0][0])
        bad[row, COL_IMM_LO] = (bad[row, COL_IMM_LO] + 1) % (1 << 17)
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_writing_final_row_rejected_at_prove(self):
        m = _matrix_for([
            I(Op.ADDI, rd=1, rs1=0, imm=3),
            I(Op.EBREAK),
        ])
        with pytest.raises(ValueError, match="halt"):
            prove_trace(m[:1], CFG)
