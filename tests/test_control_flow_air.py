"""Branch/jump pc-target AIR tests: branch rows may only step to
pc + sext17(imm) (taken) or pc + 4; JAL targets pc + sext21(16*imm +
rs1); JALR targets (rs1_val + sext17(imm)) & ~1 (prover/constraints.py
control-flow transitions)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import COL_OPCODE, COL_TAKEN
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _matrix_for(instrs, inputs=()):
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([list(inputs)])["trace"])


@pytest.fixture(scope="module")
def cf_matrix():
    # Backward taken branch (loop), untaken branch, forward taken branch,
    # JAL with a link register, JALR through a register target.
    return _matrix_for([
        I(Op.ADDI, rd=1, rs1=0, imm=2),
        I(Op.ADDI, rd=2, rs1=0, imm=1),     # 0x1004: loop body
        I(Op.SUB, rd=1, rs1=1, rs2=2),
        I(Op.BNE, rs1=1, rs2=0, imm=-8),    # taken once, then untaken
        I(Op.JAL, rd=5, imm=8),             # 0x1010: skip one instruction
        I(Op.ADDI, rd=6, rs1=0, imm=99),    # skipped
        I(Op.ADDI, rd=7, rs1=0, imm=0x1021),
        I(Op.JALR, rd=8, rs1=7, imm=0),     # target 0x1021 & ~1 = 0x1020
        I(Op.BEQ, rs1=0, rs2=0, imm=4),     # 0x1020: "taken" to pc + 4
        I(Op.EBREAK),
    ])


class TestControlFlowTargets:
    def test_honest_roundtrip(self, cf_matrix):
        proof = prove_trace(cf_matrix, CFG)
        assert verify_trace(proof)

    def test_taken_bit_matches_semantics(self, cf_matrix):
        m = cf_matrix
        branch_rows = np.nonzero((m[:, COL_OPCODE] >= 0x40)
                                 & (m[:, COL_OPCODE] <= 0x45))[0]
        assert len(branch_rows) >= 3
        # BNE executes taken once then untaken.
        bne = [r for r in branch_rows if m[r, COL_OPCODE] == int(Op.BNE)]
        assert [int(m[r, COL_TAKEN]) for r in bne] == [1, 0]

    def test_forged_branch_target_rejected(self, cf_matrix):
        # Teleport: claim the taken BNE landed 4 bytes past its target.
        m = cf_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == int(Op.BNE))[0][0])
        bad = m.copy()
        bad[row + 1, 0] += 4
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_taken_bit_rejected(self, cf_matrix):
        m = cf_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == int(Op.BNE))[0][0])
        bad = m.copy()
        bad[row, COL_TAKEN] = 1 - bad[row, COL_TAKEN]
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_jal_target_rejected(self, cf_matrix):
        m = cf_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == int(Op.JAL))[0][0])
        bad = m.copy()
        bad[row + 1, 0] -= 4          # land on the "skipped" instruction
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_jalr_target_rejected(self, cf_matrix):
        m = cf_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == int(Op.JALR))[0][0])
        bad = m.copy()
        bad[row + 1, 0] += 8
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_branch_final_row_rejected_at_prove(self, cf_matrix):
        m = cf_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == int(Op.BNE))[0][0])
        with pytest.raises(ValueError, match="halt"):
            prove_trace(m[:row + 1], CFG)


class TestHaltChain:
    """A halted machine keeps halting: EBREAK (and exit-ECALL) rows may
    only be followed by EBREAK rows, and non-exit ECALL rows advance pc
    by exactly 4 (prover/constraints.py halt-chain block)."""

    @pytest.fixture(scope="class")
    def ecall_matrix(self):
        # READ syscall (r10 = 1), a post-syscall op, then EXIT.
        return _matrix_for([
            I(Op.ADDI, rd=10, rs1=0, imm=1),
            I(Op.ECALL),                       # READ -> r10 = tape value
            I(Op.ADD, rd=2, rs1=10, rs2=10),
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ADDI, rd=11, rs1=0, imm=0),
            I(Op.ECALL),                       # EXIT 0
        ], inputs=[7])

    def test_honest_ecall_roundtrip(self, ecall_matrix):
        proof = prove_trace(ecall_matrix, CFG)
        assert verify_trace(proof)

    def test_ebreak_resurrection_rejected(self, cf_matrix):
        # Rewrite the padding row right after the final EBREAK into an
        # ADDI that "resumes" execution with the halted register file.
        from zkir_tpu.prover.constraints import COL_SEL0, OP_VALUES
        from zkir_tpu.prover.prover import _pad_rows

        padded, _ = _pad_rows(cf_matrix.copy(), min_log=2)
        n = cf_matrix.shape[0]
        assert padded.shape[0] > n
        row = padded[n].copy()
        row[COL_OPCODE] = 0x08                         # ADDI
        row[COL_SEL0 + OP_VALUES.index(0x51)] = 0
        row[COL_SEL0 + OP_VALUES.index(0x08)] = 1
        padded[n] = row
        proof = prove_trace(padded, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_nonexit_ecall_pc_teleport_rejected(self, ecall_matrix):
        # Claim the READ ecall jumped somewhere other than pc + 4.
        m = ecall_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == 0x50)[0][0])
        bad = m.copy()
        bad[row + 1, 0] += 8
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_exit_flag_rejected(self, ecall_matrix):
        # Claim the READ ecall (r10 = 1) was an EXIT to dodge the pc+4
        # constraint: the eex gadget must refuse eex = 1 with r10 != 0.
        from zkir_tpu.prover.constraints import COL_EEX, COL_EINV

        m = ecall_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == 0x50)[0][0])
        bad = m.copy()
        bad[row, COL_EEX] = 1
        bad[row, COL_EINV] = 0
        bad[row + 1, 0] += 8     # the teleport eex=1 would permit
        proof = prove_trace(bad, CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_nonexit_ecall_final_row_rejected_at_prove(self, ecall_matrix):
        m = ecall_matrix
        row = int(np.nonzero(m[:, COL_OPCODE] == 0x50)[0][0])
        with pytest.raises(ValueError, match="halt"):
            prove_trace(m[:row + 1], CFG)
