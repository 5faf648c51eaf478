"""Sub-word memory AIR: byte-level cell argument over all access widths.

Memory is proven as 8-byte-cell updates (old bytes -> new bytes at clk)
sorted by (cell, clk): sub-word stores are read-modify-writes whose
untouched bytes must be preserved, sub-word loads extract (and sign- or
zero-extend) the selected bytes of the last written cell state, and
code/data-segment initial values enter as verifier-demanded clk-0 init
rows (prover/constraints.py memory_constraints + memory_multiset;
semantics source execute.rs:477-575, memory.rs:297-487)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import FriConfig, prove_trace, trace_to_matrix, \
    verify_trace
from zkir_tpu.prover.constraints import (COL_MHNIB, COL_MLNIB, COL_MS,
                                         COL_NB0, COL_OB0, COL_OPCODE,
                                         COL_RES_CH0)
from zkir_tpu.prover.trace import N_DECODE_COLUMNS
from zkir_tpu.spec import Instruction, Op, Program

COL_RES_LO = N_DECODE_COLUMNS + 32
COL_RES_HI = N_DECODE_COLUMNS + 33

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4,
                grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _matrix(instrs, program=None):
    prog = program or Program.from_instructions(instrs)
    interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=64,
                                               collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"], program=program)


def _rows_of(matrix, op):
    return np.nonzero(matrix[:, COL_OPCODE] == int(op))[0]


@pytest.fixture(scope="module")
def subword_matrix():
    """Mixed-width traffic in one cell: SD, then SB overwrites byte 1,
    then LH reads the (modified) half, LBU the modified byte, LD the
    whole modified cell, LB a sign-extending byte."""
    instrs = [
        I(Op.ADDI, rd=7, rs1=0, imm=0x2000),
        I(Op.ADDI, rd=1, rs1=0, imm=0x1234),
        I(Op.SD, rs1=7, rs2=1, imm=8),       # [0x2008] = 0x1234
        I(Op.ADDI, rd=2, rs1=0, imm=0xAB),
        I(Op.SB, rs1=7, rs2=2, imm=9),       # byte 1 := 0xAB
        I(Op.LH, rd=3, rs1=7, imm=8),        # 0xAB34, sign-extended
        I(Op.LBU, rd=4, rs1=7, imm=9),       # 0xAB
        I(Op.LD, rd=5, rs1=7, imm=8),        # 0xAB34
        I(Op.LB, rd=6, rs1=7, imm=9),        # sign-extended 0xAB
        I(Op.EBREAK),
    ]
    return _matrix(instrs)


class TestSubwordConsistency:
    def test_semantics(self, subword_matrix):
        # sanity: the machine itself produced the RMW values
        m = subword_matrix
        lh = int(_rows_of(m, Op.LH)[0])
        got = int(m[lh + 1, 8 + 3]) + (int(m[lh + 1, 8 + 16 + 3]) << 20)
        assert got == (0xAB34 | (((1 << 40) - 1) << 16)) & ((1 << 40) - 1)

    def test_honest_roundtrip(self, subword_matrix):
        proof = prove_trace(subword_matrix, CFG, range_lookup=True)
        assert verify_trace(proof)

    def test_forged_lbu_result_rejected(self, subword_matrix):
        # Consistently forge the LBU result AND its old-cell bytes (so
        # every single-row pin holds): only the cross-row update chain
        # can catch the lie about the cell's pre-state.
        bad = subword_matrix.copy()
        row = int(_rows_of(bad, Op.LBU)[0])
        rd = int(bad[row, 3])
        forged = 0xCD
        bad[row, COL_OB0 + 1] = forged       # claimed pre-state byte
        bad[row, COL_NB0 + 1] = forged
        bad[row, COL_RES_LO] = forged
        bad[row, COL_RES_CH0 + 0] = forged
        bad[row, COL_RES_CH0 + 1] = 0
        bad[row + 1:, 8 + rd] = forged
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))

    def test_forged_sb_preservation_rejected(self, subword_matrix):
        # The SB must preserve the cell's other bytes: forge its new
        # byte 0 (claiming SB also cleared it) with all downstream reads
        # adjusted -> the SB row's own new-cell pin breaks.
        bad = subword_matrix.copy()
        row = int(_rows_of(bad, Op.SB)[0])
        bad[row, COL_NB0 + 0] = 0
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))

    def test_forged_sign_bit_rejected(self, subword_matrix):
        # LB of 0xAB (negative): flip the committed sign bit and
        # re-derive the result as a zero-extension.
        bad = subword_matrix.copy()
        row = int(_rows_of(bad, Op.LB)[0])
        rd = int(bad[row, 3])
        bad[row, COL_MS] = 0
        bad[row, COL_RES_LO] = 0xAB
        bad[row, COL_RES_HI] = 0
        bad[row, COL_RES_CH0 + 0] = 0xAB
        bad[row, COL_RES_CH0 + 1] = 0
        bad[row, COL_RES_CH0 + 2] = 0
        bad[row, COL_RES_CH0 + 3] = 0
        bad[row + 1:, 8 + rd] = 0xAB
        bad[row + 1:, 8 + 16 + rd] = 0
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))

    def test_forged_ld_nibble_rejected(self, subword_matrix):
        # The LD limb-boundary nibble split must be consistent.
        bad = subword_matrix.copy()
        row = int(_rows_of(bad, Op.LD)[0])
        bad[row, COL_MLNIB] = (int(bad[row, COL_MLNIB]) + 1) % 16
        bad[row, COL_MHNIB] = (int(bad[row, COL_MHNIB]) + 15) % 16
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))


class TestDataSegmentInit:
    @pytest.fixture(scope="class")
    def data_case(self):
        """A program whose data segment is read directly: the LD result
        must equal the public initial bytes (init rows demanded by the
        verifier from the program)."""
        instrs = [
            I(Op.ADDI, rd=7, rs1=0, imm=0x1000),  # code base
            I(Op.LD, rd=1, rs1=7, imm=6 * 4),     # data starts after code
            I(Op.LBU, rd=2, rs1=7, imm=6 * 4 + 2),
            I(Op.SB, rs1=7, rs2=2, imm=6 * 4 + 9),
            I(Op.LD, rd=3, rs1=7, imm=6 * 4 + 8),
            I(Op.EBREAK),
        ]
        program = Program.from_instructions(instrs)
        program.data = bytes(range(1, 17))        # 16 data bytes
        program.header.data_size = len(program.data)
        matrix = _matrix(instrs, program=program)
        return program, matrix

    def test_machine_reads_data(self, data_case):
        program, m = data_case
        row = int(_rows_of(m, Op.LD)[0])
        got = int(m[row + 1, 8 + 1]) + (int(m[row + 1, 8 + 16 + 1]) << 20)
        assert got == int.from_bytes(bytes(range(1, 9)), "little") \
            & ((1 << 40) - 1)

    def test_data_segment_proves_and_verifies(self, data_case):
        program, matrix = data_case
        proof = prove_trace(matrix, CFG, range_lookup=True,
                            program=program)
        assert verify_trace(proof, program=program)

    def test_wrong_data_segment_rejected(self, data_case):
        program, matrix = data_case
        other = Program.from_bytes(program.to_bytes())
        other.data = bytes([99]) + bytes(program.data[1:])
        assert not verify_trace(
            prove_trace(matrix, CFG, range_lookup=True, program=program),
            program=other)

    def test_unbound_proof_of_data_read_fails_closed(self, data_case):
        # Without the public program there is no init demand, so a trace
        # that read nonzero initial memory cannot be proven (zero-init
        # only) — completeness failure, never unsoundness.
        program, matrix = data_case
        try:
            proof = prove_trace(matrix, CFG, range_lookup=True)
        except Exception:
            return  # rejected at prove time is fine too
        assert not verify_trace(proof)
