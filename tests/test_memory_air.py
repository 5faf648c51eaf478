"""Memory-op binding AIR tests: load/store addresses are pinned to
base + sext17(imm) (range-checked limbs), zero-extending load results
equal the committed memory value, and SW/SD stored values equal the rs2
operand (prover/constraints.py memory-op binding block).

The S-type quirk is covered: the base register rides the rd bitfield and
the value register the rs1 bitfield (encoding.rs:142-159)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import (
    COL_MADDR_CH0,
    COL_MEM_ADDR_LO,
    COL_MEM_FLAGS,
    COL_MEM_VAL_HI,
    COL_MEM_VAL_LO,
    COL_OPCODE,
    COL_RES_CH0,
)
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.trace import N_DECODE_COLUMNS
from zkir_tpu.spec import Instruction, Op, Program

COL_RES_LO = N_DECODE_COLUMNS + 32
COL_RES_HI = N_DECODE_COLUMNS + 33

CFG = FriConfig(log_blowup=2, log_final=1, num_queries=4, grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


@pytest.fixture(scope="module")
def mem_matrix():
    instrs = [
        I(Op.ADDI, rd=1, rs1=0, imm=-2),       # r1 = 2^40 - 2
        I(Op.ADDI, rd=7, rs1=0, imm=0x2000),   # base
        I(Op.SD, rs1=7, rs2=1, imm=8),
        I(Op.LD, rd=2, rs1=7, imm=8),
        I(Op.SW, rs1=7, rs2=1, imm=16),        # stores r1 mod 2^32
        I(Op.LW, rd=3, rs1=7, imm=16),
        I(Op.LB, rd=4, rs1=7, imm=8),          # sign-extending (unpinned)
        I(Op.LBU, rd=5, rs1=7, imm=8),
        I(Op.EBREAK),
    ]
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"])


def _row_of(matrix, op):
    return int(np.nonzero(matrix[:, COL_OPCODE] == int(op))[0][0])


class TestMemoryOpBinding:
    def test_honest_roundtrip(self, mem_matrix):
        assert verify_trace(prove_trace(mem_matrix, CFG))

    def test_forged_load_address_rejected(self, mem_matrix):
        # Self-consistent address forgery (chunks re-derived): the pin to
        # base + imm is the only thing that can catch it.
        bad = mem_matrix.copy()
        row = _row_of(bad, Op.LD)
        na = int(bad[row, COL_MEM_ADDR_LO]) + 8
        bad[row, COL_MEM_ADDR_LO] = na
        bad[row, COL_MADDR_CH0] = na & 0x3FF
        bad[row, COL_MADDR_CH0 + 1] = na >> 10
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    def test_forged_store_address_rejected(self, mem_matrix):
        bad = mem_matrix.copy()
        row = _row_of(bad, Op.SW)
        na = int(bad[row, COL_MEM_ADDR_LO]) + 4
        bad[row, COL_MEM_ADDR_LO] = na
        bad[row, COL_MADDR_CH0] = na & 0x3FF
        bad[row, COL_MADDR_CH0 + 1] = na >> 10
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    @pytest.mark.parametrize("op", [Op.LW, Op.LD, Op.LBU])
    def test_forged_load_value_rejected(self, mem_matrix, op):
        bad = mem_matrix.copy()
        row = _row_of(bad, op)
        bad[row, COL_MEM_VAL_LO] = (bad[row, COL_MEM_VAL_LO] + 1) % (1 << 20)
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    @pytest.mark.parametrize("op", [Op.SW, Op.SD])
    def test_forged_store_value_rejected(self, mem_matrix, op):
        bad = mem_matrix.copy()
        row = _row_of(bad, op)
        bad[row, COL_MEM_VAL_LO] = (bad[row, COL_MEM_VAL_LO] + 1) % (1 << 20)
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))

    def test_forged_flags_rejected(self, mem_matrix):
        # Claiming a store was a load (or hiding the op) breaks the
        # selector-derived flags binding.
        bad = mem_matrix.copy()
        row = _row_of(bad, Op.SD)
        bad[row, COL_MEM_FLAGS] = 0
        assert not verify_trace(prove_trace(bad, CFG, selfcheck=False))


def _run_matrix(instrs):
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"])


@pytest.fixture(scope="module")
def consistency_matrix():
    """SD/LD traffic across two addresses, plus a read of a never-written
    address (must see 0)."""
    instrs = [
        I(Op.ADDI, rd=7, rs1=0, imm=0x2000),
        I(Op.ADDI, rd=1, rs1=0, imm=123),
        I(Op.ADDI, rd=2, rs1=0, imm=456),
        I(Op.SD, rs1=7, rs2=1, imm=8),         # [0x2008] = 123
        I(Op.SD, rs1=7, rs2=2, imm=16),        # [0x2010] = 456
        I(Op.LD, rd=3, rs1=7, imm=8),          # 123
        I(Op.SD, rs1=7, rs2=3, imm=8),         # [0x2008] = 123 again
        I(Op.LD, rd=4, rs1=7, imm=16),         # 456
        I(Op.LD, rd=5, rs1=7, imm=24),         # never written -> 0
        I(Op.EBREAK),
    ]
    return _run_matrix(instrs)


def _forge_load_value(matrix, row, delta_val):
    """Consistently forge an LD row's loaded value: memory columns, the
    res binding, its range chunks, and the downstream register file —
    every single-row constraint still holds, so only the cross-row
    memory-consistency argument can reject it."""
    bad = matrix.copy()
    rd = int(bad[row, 3])
    val = (int(bad[row, COL_MEM_VAL_LO])
           + (int(bad[row, COL_MEM_VAL_HI]) << 20))
    nv = (val + delta_val) % (1 << 40)
    lo, hi = nv & ((1 << 20) - 1), nv >> 20
    bad[row, COL_MEM_VAL_LO] = lo
    bad[row, COL_MEM_VAL_HI] = hi
    bad[row, COL_RES_LO] = lo
    bad[row, COL_RES_HI] = hi
    bad[row, COL_RES_CH0 + 0] = lo & 0x3FF
    bad[row, COL_RES_CH0 + 1] = lo >> 10
    bad[row, COL_RES_CH0 + 2] = hi & 0x3FF
    bad[row, COL_RES_CH0 + 3] = hi >> 10
    bad[row + 1:, 8 + rd] = lo
    bad[row + 1:, 8 + 16 + rd] = hi
    return bad


class TestMemoryConsistency:
    """The address-sorted memory table + LogUp multiset argument
    (range_lookup mode): reads must return the last written value, fresh
    addresses read zero."""

    def test_honest_roundtrip(self, consistency_matrix):
        proof = prove_trace(consistency_matrix, CFG, range_lookup=True)
        assert verify_trace(proof)

    def test_forged_read_value_rejected(self, consistency_matrix):
        # LD of r4 <- [0x2010] claims 457 instead of the stored 456; all
        # single-row bindings are re-derived, the sorted table itself is
        # rebuilt by the prover — only read-write consistency breaks.
        row = 7
        assert int(consistency_matrix[row, COL_OPCODE]) == int(Op.LD)
        bad = _forge_load_value(consistency_matrix, row, 1)
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))

    def test_forged_fresh_read_rejected(self, consistency_matrix):
        # The never-written address must read 0.
        row = 8
        assert int(consistency_matrix[row, COL_OPCODE]) == int(Op.LD)
        bad = _forge_load_value(consistency_matrix, row, 99)
        assert not verify_trace(prove_trace(bad, CFG, range_lookup=True, selfcheck=False))
