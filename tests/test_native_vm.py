"""Differential tests: native C++ core vs the Python oracle."""

import pathlib
import time

import numpy as np
import pytest

from zkir_tpu.asm import assemble
from zkir_tpu.runtime import HaltReason, VM, VMConfig
from zkir_tpu.runtime.native_vm import (
    HALT_CYCLE_LIMIT,
    HALT_EBREAK,
    HALT_ERROR,
    HALT_EXIT,
    available,
    run_native,
)
from zkir_tpu.spec import Instruction, Op, Program

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"

_HALT_MAP = {
    HaltReason.EBREAK: HALT_EBREAK,
    HaltReason.EXIT: HALT_EXIT,
    HaltReason.CYCLE_LIMIT: HALT_CYCLE_LIMIT,
}


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def check(program, inputs, max_cycles=100_000):
    vm = VM(program, list(inputs), VMConfig(max_cycles=max_cycles))
    oracle = vm.run()
    native = run_native(program, list(inputs), max_cycles=max_cycles)
    assert native.halt == _HALT_MAP[oracle.halt_reason.reason]
    assert native.cycles == oracle.cycles
    assert native.outputs == oracle.outputs
    if oracle.halt_reason.reason == HaltReason.EXIT:
        assert native.exit_code == oracle.halt_reason.code
    assert native.regs == vm.state.regs
    return native


class TestNativeParity:
    def test_fibonacci(self):
        program = assemble((EXAMPLES / "fibonacci.zkasm").read_text())
        for n in (0, 1, 10, 30):
            check(program, [n])

    def test_all_widths_memory(self):
        check(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=0x8000),
            I(Op.ADDI, rd=2, rs1=0, imm=-2),
            I(Op.SB, rs1=1, rs2=2, imm=0),
            I(Op.SH, rs1=1, rs2=2, imm=2),
            I(Op.SW, rs1=1, rs2=2, imm=4),
            I(Op.SD, rs1=1, rs2=2, imm=8),
            I(Op.LB, rd=3, rs1=1, imm=0),
            I(Op.LBU, rd=4, rs1=1, imm=0),
            I(Op.LH, rd=5, rs1=1, imm=2),
            I(Op.LHU, rd=6, rs1=1, imm=2),
            I(Op.LW, rd=7, rs1=1, imm=4),
            I(Op.LD, rd=8, rs1=1, imm=8),
            I(Op.EBREAK),
        ]), [])

    def test_div_semantics(self):
        check(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=-9),
            I(Op.ADDI, rd=2, rs1=0, imm=7),
            I(Op.DIV, rd=3, rs1=1, rs2=2),
            I(Op.REM, rd=4, rs1=1, rs2=2),
            I(Op.DIVU, rd=5, rs1=1, rs2=2),
            I(Op.REMU, rd=6, rs1=1, rs2=2),
            I(Op.EBREAK),
        ]), [])

    def test_cycle_limit(self):
        native = run_native(
            Program.from_instructions([I(Op.JAL, rd=0, imm=0)]), [],
            max_cycles=500)
        assert native.halt == HALT_CYCLE_LIMIT
        assert native.cycles == 500

    def test_div_zero_errors(self):
        native = run_native(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=5),
            I(Op.DIV, rd=3, rs1=1, rs2=2),
        ]), [])
        assert native.halt == HALT_ERROR

    def test_random_programs(self):
        rng = np.random.default_rng(77)
        safe = [Op.ADD, Op.SUB, Op.MUL, Op.MULH, Op.AND, Op.OR, Op.XOR,
                Op.SLL, Op.SRL, Op.SRA, Op.SLT, Op.SLTU, Op.SGE, Op.SGEU,
                Op.SEQ, Op.SNE, Op.CMOV, Op.CMOVZ, Op.CMOVNZ,
                Op.ADDI, Op.ANDI, Op.ORI, Op.XORI, Op.SLLI, Op.SRLI, Op.SRAI]
        for _ in range(5):
            instrs = [I(Op.ADDI, rd=r, rs1=0,
                        imm=int(rng.integers(-(1 << 16), 1 << 16)))
                      for r in range(1, 16)]
            for _ in range(200):
                op = safe[int(rng.integers(len(safe)))]
                rd = int(rng.integers(1, 16))
                rs1 = int(rng.integers(0, 16))
                rs2 = int(rng.integers(0, 16))
                if op in (Op.SLLI, Op.SRLI, Op.SRAI):
                    instrs.append(I(op, rd=rd, rs1=rs1,
                                    imm=int(rng.integers(0, 64))))
                elif op in (Op.ADDI, Op.ANDI, Op.ORI, Op.XORI):
                    instrs.append(I(op, rd=rd, rs1=rs1,
                                    imm=int(rng.integers(-(1 << 16), 1 << 16))))
                else:
                    instrs.append(I(op, rd=rd, rs1=rs1, rs2=rs2))
            instrs.append(I(Op.EBREAK))
            check(Program.from_instructions(instrs), [])


class TestNativeSpeed:
    def test_meets_reference_execution_target(self):
        """Reference target: >50M cycles/sec (README.md:278)."""
        program = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=7),
            I(Op.ADD, rd=2, rs1=2, rs2=1),
            I(Op.XOR, rd=3, rs1=2, rs2=1),
            I(Op.JAL, rd=0, imm=-8),
        ])
        n_cycles = 3_000_000
        t0 = time.perf_counter()
        native = run_native(program, [], max_cycles=n_cycles)
        elapsed = time.perf_counter() - t0
        assert native.halt == HALT_CYCLE_LIMIT
        rate = n_cycles / elapsed
        assert rate > 50e6, f"native VM too slow: {rate/1e6:.1f}M cycles/s"
