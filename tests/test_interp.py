"""Differential tests: batched columnar interpreter vs the scalar oracle VM.

Every program is executed by both engines; outputs, cycle counts, halt
reasons, final registers, bound columns, and trace rows must match
bit-exactly.
"""

import pathlib

import numpy as np
import pytest

from zkir_tpu.asm import assemble
from zkir_tpu.interp import (
    HALT_CYCLE_LIMIT,
    HALT_EBREAK,
    HALT_ERROR,
    HALT_EXIT,
    InterpConfig,
    TpuInterpreter,
)
from zkir_tpu.runtime import VM, VMConfig, HaltReason
from zkir_tpu.spec import Instruction, Op, Program

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"

_HALT_MAP = {
    HaltReason.EBREAK: HALT_EBREAK,
    HaltReason.EXIT: HALT_EXIT,
    HaltReason.CYCLE_LIMIT: HALT_CYCLE_LIMIT,
}


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def run_both(program, inputs, deferred=False, trace=False, max_cycles=100_000):
    vm = VM(program, list(inputs), VMConfig(
        max_cycles=max_cycles,
        enable_execution_trace=trace,
        enable_deferred_model=deferred,
    ))
    oracle = vm.run()

    interp = TpuInterpreter(program, InterpConfig(
        lanes=1, chunk=64, collect_trace=trace, deferred=deferred,
    ))
    device = interp.run([list(inputs)], max_cycles=max_cycles)
    return vm, oracle, device


def check_parity(program, inputs, deferred=False, trace=False,
                 max_cycles=100_000):
    vm, oracle, device = run_both(program, inputs, deferred, trace, max_cycles)

    assert int(device["cycles"][0]) == oracle.cycles, "cycle count"
    assert device["halted"][0] == _HALT_MAP[oracle.halt_reason.reason]
    if oracle.halt_reason.reason == HaltReason.EXIT:
        assert int(device["exit_code"][0]) == oracle.halt_reason.code
    assert [int(x) for x in device["outputs"][0]] == oracle.outputs

    # Final register file must match bit-exactly.
    for r in range(16):
        assert int(device["regs"][0, r]) == vm.state.regs[r], f"r{r}"
    # Bound columns.
    for r in range(16):
        assert int(device["bound_bits"][0, r]) == vm.state.bounds[r].max_bits, \
            f"bound r{r}"

    if trace:
        dtrace = device["trace"]
        valid = np.nonzero(dtrace["valid"][:, 0])[0]
        rows = oracle.execution_trace
        assert len(valid) == len(rows)
        for dev_i, row in zip(valid, rows):
            assert int(dtrace["cycle"][dev_i, 0]) == row.cycle
            assert int(dtrace["pc"][dev_i, 0]) == row.pc
            assert int(dtrace["word"][dev_i, 0]) == row.instruction
            for r in range(16):
                assert int(dtrace["regs"][dev_i, 0, r]) == row.registers[r], \
                    (row.cycle, r)
                assert int(dtrace["bounds"][dev_i, 0, r]) \
                    == row.bounds[r].max_bits, (row.cycle, r)
            # Memory op slot vs oracle row ops (crypto rows excluded —
            # device traces at most one data op per plain instruction).
            if dtrace["mem_valid"][dev_i, 0]:
                assert len(row.memory_ops) == 1
                mop = row.memory_ops[0]
                assert int(dtrace["mem_addr"][dev_i, 0]) == mop.address
                assert int(dtrace["mem_value"][dev_i, 0]) == mop.value
                assert int(dtrace["mem_width"][dev_i, 0]) == mop.width
                assert bool(dtrace["mem_is_write"][dev_i, 0]) == mop.is_write
            else:
                assert row.memory_ops == []
    return vm, oracle, device


class TestBasicParity:
    def test_arith_program(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=10),
            I(Op.ADDI, rd=2, rs1=0, imm=20),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.SUB, rd=4, rs1=1, rs2=2),
            I(Op.MUL, rd=5, rs1=1, rs2=2),
            I(Op.MULH, rd=6, rs1=1, rs2=2),
            I(Op.EBREAK),
        ]), [], trace=True)

    def test_40bit_wrap(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=-1),  # 40-bit all ones after mask
            I(Op.ADDI, rd=2, rs1=0, imm=1),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.SUB, rd=4, rs1=2, rs2=1),
            I(Op.MUL, rd=5, rs1=1, rs2=1),
            I(Op.EBREAK),
        ]), [], trace=True)

    def test_div_family(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=1000),
            I(Op.ADDI, rd=2, rs1=0, imm=7),
            I(Op.DIV, rd=3, rs1=1, rs2=2),
            I(Op.DIVU, rd=4, rs1=1, rs2=2),
            I(Op.REM, rd=5, rs1=1, rs2=2),
            I(Op.REMU, rd=6, rs1=1, rs2=2),
            I(Op.ADDI, rd=7, rs1=0, imm=-9),
            I(Op.DIV, rd=8, rs1=7, rs2=2),  # raw-u64 "negative" semantics
            I(Op.EBREAK),
        ]), [], trace=True)

    def test_div_by_zero_halts_with_error(self):
        program = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=5),
            I(Op.DIV, rd=3, rs1=1, rs2=2),
            I(Op.EBREAK),
        ])
        interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=16))
        device = interp.run([[]])
        assert device["halted"][0] == HALT_ERROR

    def test_logic_shift_compare(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=0x5A5A),
            I(Op.ADDI, rd=2, rs1=0, imm=0x0F0F),
            I(Op.AND, rd=3, rs1=1, rs2=2),
            I(Op.OR, rd=4, rs1=1, rs2=2),
            I(Op.XOR, rd=5, rs1=1, rs2=2),
            I(Op.ANDI, rd=6, rs1=1, imm=-1),
            I(Op.ORI, rd=7, rs1=1, imm=0x33),
            I(Op.XORI, rd=8, rs1=1, imm=-256),
            I(Op.SLLI, rd=9, rs1=1, imm=8),
            I(Op.SRLI, rd=11, rs1=9, imm=3),
            I(Op.SRAI, rd=12, rs1=8, imm=4),
            I(Op.ADDI, rd=13, rs1=0, imm=3),
            I(Op.SLL, rd=14, rs1=1, rs2=13),
            I(Op.SRA, rd=15, rs1=8, rs2=13),
            I(Op.SLT, rd=3, rs1=8, rs2=1),
            I(Op.SLTU, rd=4, rs1=8, rs2=1),
            I(Op.SGE, rd=5, rs1=8, rs2=1),
            I(Op.SGEU, rd=6, rs1=8, rs2=1),
            I(Op.SEQ, rd=7, rs1=1, rs2=1),
            I(Op.SNE, rd=9, rs1=1, rs2=2),
            I(Op.EBREAK),
        ]), [], trace=True)

    def test_cmov(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=42),
            I(Op.ADDI, rd=2, rs1=0, imm=1),
            I(Op.ADDI, rd=3, rs1=0, imm=7),
            I(Op.CMOV, rd=3, rs1=1, rs2=2),   # taken
            I(Op.ADDI, rd=4, rs1=0, imm=7),
            I(Op.CMOV, rd=4, rs1=1, rs2=0),   # not taken
            I(Op.CMOVZ, rd=5, rs1=1, rs2=0),  # taken
            I(Op.CMOVNZ, rd=6, rs1=1, rs2=2),
            I(Op.EBREAK),
        ]), [], trace=True)

    def test_memory_all_widths(self):
        check_parity(Program.from_instructions([
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
        ]), [], trace=True)

    def test_branches_and_jumps(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=5),
            I(Op.ADDI, rd=2, rs1=2, imm=1),   # loop body
            I(Op.ADDI, rd=1, rs1=1, imm=-1),
            I(Op.BNE, rs1=1, rs2=0, imm=-8),
            I(Op.JAL, rd=3, imm=8),
            I(Op.EBREAK),                      # skipped by jal
            I(Op.ADDI, rd=4, rs1=0, imm=0x1014),
            I(Op.JALR, rd=5, rs1=4, imm=0),    # jump back to the ebreak
        ]), [], trace=True)

    def test_io_syscalls(self):
        check_parity(Program.from_instructions([
            I(Op.ADDI, rd=10, rs1=0, imm=1),
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=10, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),
            I(Op.ECALL),
            I(Op.ADDI, rd=10, rs1=0, imm=1),
            I(Op.ECALL),                        # exhausted -> 0
            I(Op.ADDI, rd=11, rs1=10, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=0, imm=3),
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ECALL),                        # exit 3
        ]), [77], trace=True)

    def test_cycle_limit(self):
        program = Program.from_instructions([I(Op.JAL, rd=0, imm=0)])
        _, oracle, device = run_both(program, [], max_cycles=128)
        assert device["halted"][0] == HALT_CYCLE_LIMIT
        assert oracle.halt_reason.reason == HaltReason.CYCLE_LIMIT


class TestFibonacciParity:
    def test_fibonacci(self):
        program = assemble((EXAMPLES / "fibonacci.zkasm").read_text())
        for n in (0, 1, 5, 20):
            check_parity(program, [n], trace=True)

    def test_fibonacci_deferred(self):
        program = assemble((EXAMPLES / "fibonacci.zkasm").read_text())
        _, oracle, device = run_both(program, [15], deferred=True)
        assert [int(x) for x in device["outputs"][0]] == oracle.outputs == [610]
        assert int(device["cycles"][0]) == oracle.cycles


class TestDeferredParity:
    def test_deferred_matches_oracle(self):
        program = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=(1 << 16) - 1),
            I(Op.ADD, rd=2, rs1=2, rs2=1),
            I(Op.ADD, rd=2, rs1=2, rs2=1),
            I(Op.ADD, rd=2, rs1=2, rs2=1),
            I(Op.SUB, rd=3, rs1=2, rs2=1),
            I(Op.BEQ, rs1=2, rs2=2, imm=4),   # observation point
            I(Op.ADDI, rd=4, rs1=2, imm=5),
            I(Op.AND, rd=5, rs1=2, rs2=3),    # obs point on rs1+rs2
            I(Op.EBREAK),
        ])
        vm, oracle, device = run_both(program, [], deferred=True)
        for r in range(16):
            assert int(device["regs"][0, r]) == vm.state.regs[r], f"r{r}"
        assert int(device["cycles"][0]) == oracle.cycles

    def test_deferred_normalization_witnesses(self):
        program = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=100),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.BEQ, rs1=3, rs2=3, imm=4),
            I(Op.EBREAK),
        ])
        vm, oracle, device = run_both(program, [], deferred=True, trace=True)
        dtrace = device["trace"]
        dev_events = [
            (int(dtrace["cycle"][i, 0]), int(dtrace["norm_reg"][i, 0]),
             int(dtrace["norm_acc0"][i, 0]), int(dtrace["norm_acc1"][i, 0]),
             int(dtrace["norm_n0"][i, 0]), int(dtrace["norm_n1"][i, 0]),
             int(dtrace["norm_c0"][i, 0]), int(dtrace["norm_c1"][i, 0]))
            for i in np.nonzero(dtrace["norm_valid"][:, 0])[0]
        ]
        oracle_events = [
            (e.witness.cycle, e.witness.register,
             e.witness.accumulated_limbs[0], e.witness.accumulated_limbs[1],
             e.witness.normalized_limbs[0], e.witness.normalized_limbs[1],
             e.witness.carries[0], e.witness.carries[1])
            for e in oracle.normalization_witnesses
        ]
        assert dev_events == oracle_events


class TestRandomDifferential:
    """Pseudo-random straight-line programs, oracle vs device."""

    SAFE_OPS = [
        Op.ADD, Op.SUB, Op.MUL, Op.MULH, Op.AND, Op.OR, Op.XOR,
        Op.SLL, Op.SRL, Op.SRA, Op.SLT, Op.SLTU, Op.SGE, Op.SGEU,
        Op.SEQ, Op.SNE, Op.CMOV, Op.CMOVZ, Op.CMOVNZ,
        Op.ADDI, Op.ANDI, Op.ORI, Op.XORI, Op.SLLI, Op.SRLI, Op.SRAI,
    ]

    def _random_program(self, rng, n=120):
        instrs = []
        # Seed registers with interesting values.
        for r in range(1, 16):
            instrs.append(I(Op.ADDI, rd=r, rs1=0,
                            imm=int(rng.integers(-(1 << 16), 1 << 16))))
        for _ in range(n):
            op = self.SAFE_OPS[int(rng.integers(len(self.SAFE_OPS)))]
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
            # Occasionally store/load at a safe scratch address.
            if rng.random() < 0.15:
                instrs.append(I(Op.ADDI, rd=15, rs1=0, imm=0x6000))
                width_op = [Op.SB, Op.SH, Op.SW, Op.SD][int(rng.integers(4))]
                offset = int(rng.integers(0, 16)) * 8
                instrs.append(I(width_op, rs1=15, rs2=rd, imm=offset))
                load_op = [Op.LB, Op.LBU, Op.LH, Op.LHU, Op.LW, Op.LD][
                    int(rng.integers(6))]
                instrs.append(I(load_op, rd=int(rng.integers(1, 15)),
                                rs1=15, imm=offset))
        instrs.append(I(Op.EBREAK))
        return Program.from_instructions(instrs)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_plain(self, seed):
        rng = np.random.default_rng(seed)
        program = self._random_program(rng)
        check_parity(program, [], trace=(seed == 1))

    @pytest.mark.parametrize("seed", [11, 12])
    def test_random_deferred(self, seed):
        rng = np.random.default_rng(seed)
        program = self._random_program(rng, n=80)
        vm, oracle, device = run_both(program, [], deferred=True)
        for r in range(16):
            assert int(device["regs"][0, r]) == vm.state.regs[r], f"r{r}"
        assert int(device["cycles"][0]) == oracle.cycles


class TestMultiLane:
    def test_lanes_with_different_inputs(self):
        program = assemble((EXAMPLES / "fibonacci.zkasm").read_text())
        interp = TpuInterpreter(program, InterpConfig(lanes=4, chunk=64))
        device = interp.run([[5], [10], [15], [20]])
        expected = [5, 55, 610, 6765]
        for lane in range(4):
            assert [int(x) for x in device["outputs"][lane]] == [expected[lane]]
            assert device["halted"][lane] == HALT_EXIT


class TestCryptoHostMediated:
    def test_sha256_syscall(self):
        instrs = []
        for i, byte in enumerate(b"hello"):
            instrs += [
                I(Op.ADDI, rd=1, rs1=0, imm=0x3000 + i),
                I(Op.ADDI, rd=2, rs1=0, imm=byte),
                I(Op.SB, rs1=1, rs2=2, imm=0),
            ]
        instrs += [
            I(Op.ADDI, rd=10, rs1=0, imm=3),
            I(Op.ADDI, rd=11, rs1=0, imm=0x3000),
            I(Op.ADDI, rd=12, rs1=0, imm=5),
            I(Op.ADDI, rd=13, rs1=0, imm=0x4000),
            I(Op.ECALL),
            I(Op.ADDI, rd=1, rs1=0, imm=0x4000),
            I(Op.LW, rd=11, rs1=1, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),
            I(Op.ECALL),
            I(Op.EBREAK),
        ]
        program = Program.from_instructions(instrs)
        vm, oracle, device = run_both(program, [])
        assert [int(x) for x in device["outputs"][0]] == [0x2CF24DBA]
        assert int(device["cycles"][0]) == oracle.cycles
