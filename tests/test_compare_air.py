"""Compare / branch-condition / cmov AIR tests: the branch taken bit is
derived from the operands (eq gadget + borrow-based unsigned lt + the
sign-XOR trick for signed lt), compare-family results are pinned to the
predicates, and cmov results follow the [b == 0] condition
(prover/constraints.py compare block; semantics from
execute.rs:434-636 / interp/columnar.py)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import (
    COL_CEQ,
    COL_CINV,
    COL_OPCODE,
    COL_RES_CH0,
    COL_TAKEN,
)
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.trace import N_DECODE_COLUMNS
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)
COL_RES_LO = N_DECODE_COLUMNS + 32


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _run_matrix(instrs):
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"])


@pytest.fixture(scope="module")
def cmp_matrix():
    # r1 = 5, r2 = 2^40 - 3 (negative signed, huge unsigned), r3 = 5.
    instrs = [
        I(Op.ADDI, rd=1, rs1=0, imm=5),
        I(Op.ADDI, rd=2, rs1=0, imm=-3),
        I(Op.ADDI, rd=3, rs1=0, imm=5),
        I(Op.SLT, rd=4, rs1=2, rs2=1),     # -3 <s 5  -> 1
        I(Op.SLTU, rd=5, rs1=2, rs2=1),    # huge <u 5 -> 0
        I(Op.SEQ, rd=6, rs1=1, rs2=3),     # 5 == 5   -> 1
        I(Op.SNE, rd=7, rs1=1, rs2=2),     # 5 != -3  -> 1
        I(Op.SGE, rd=8, rs1=1, rs2=2),     # 5 >=s -3 -> 1
        I(Op.SGEU, rd=9, rs1=1, rs2=2),    # 5 >=u huge -> 0
        I(Op.CMOV, rd=11, rs1=1, rs2=2),   # b != 0 -> r11 = 5
        I(Op.CMOVZ, rd=12, rs1=1, rs2=0),  # b == 0 -> r12 = 5
        I(Op.CMOVNZ, rd=13, rs1=1, rs2=0),  # b == 0 -> no write
        I(Op.BLT, rs1=2, rs2=1, imm=8),    # taken: skip next
        I(Op.ADDI, rd=14, rs1=0, imm=99),  # skipped
        I(Op.BEQ, rs1=1, rs2=2, imm=8),    # not taken
        I(Op.ADDI, rd=15, rs1=0, imm=7),   # executed
        I(Op.BEQ, rs1=1, rs2=3, imm=4),    # taken, target == pc + 4
        I(Op.EBREAK),
    ]
    return _run_matrix(instrs)


def _rows_of(matrix, op):
    return [int(r) for r in np.nonzero(matrix[:, COL_OPCODE] == int(op))[0]]


class TestCompareAir:
    def test_machine_results(self, cmp_matrix):
        # Post-state register file (limb0 of the final row).
        final = cmp_matrix[-1, 8:24]
        assert [int(final[r]) for r in (4, 5, 6, 7, 8, 9)] == \
            [1, 0, 1, 1, 1, 0]
        assert int(final[11]) == 5 and int(final[12]) == 5
        assert int(final[13]) == 0          # CMOVNZ condition false
        assert int(final[14]) == 0          # skipped by taken BLT
        assert int(final[15]) == 7          # executed after untaken BEQ

    def test_degenerate_branch_taken_bit(self, cmp_matrix):
        # The BEQ with target == pc + 4: taken must be the predicate (1),
        # not inferred from the (ambiguous) pc delta.
        row = _rows_of(cmp_matrix, Op.BEQ)[-1]
        assert int(cmp_matrix[row, COL_TAKEN]) == 1

    def test_honest_roundtrip(self, cmp_matrix):
        assert verify_trace(prove_trace(cmp_matrix, CFG))

    @pytest.mark.parametrize("op,idx", [
        (Op.BLT, 0), (Op.BEQ, 0), (Op.BEQ, 1)])
    def test_forged_taken_rejected(self, cmp_matrix, op, idx):
        # Flipping the committed taken bit alone: the predicate pin
        # rejects it even when the pc chain stays consistent (the
        # degenerate +4 BEQ) or before pc mismatches get a chance.
        bad = cmp_matrix.copy()
        row = _rows_of(bad, op)[idx]
        bad[row, COL_TAKEN] ^= 1
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    @pytest.mark.parametrize("op", [Op.SLT, Op.SLTU, Op.SEQ, Op.SGEU])
    def test_forged_compare_result_rejected(self, cmp_matrix, op):
        bad = cmp_matrix.copy()
        row = _rows_of(bad, op)[0]
        rd = int(bad[row, 3])
        nv = 1 - int(bad[row, COL_RES_LO])
        bad[row, COL_RES_LO] = nv
        bad[row, COL_RES_CH0] = nv
        bad[row + 1:, 8 + rd] = nv
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    def test_forged_cmov_rejected(self, cmp_matrix):
        # CMOVNZ with b == 0 writes nothing; claiming it moved a (and
        # forging the eq gadget to say b != 0) must fail: cinv cannot
        # invert zero.
        bad = cmp_matrix.copy()
        row = _rows_of(bad, Op.CMOVNZ)[0]
        rd = int(bad[row, 3])
        bad[row, COL_CEQ] = 0
        bad[row, COL_CINV] = 12345
        bad[row, COL_RES_LO] = 5
        bad[row, COL_RES_CH0] = 5
        bad[row + 1:, 8 + rd] = 5
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))
