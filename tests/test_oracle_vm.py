"""Oracle VM parity tests.

Vector sources: reference zkir-runtime src-level tests (vm.rs:414-1201,
execute.rs:675-868, state.rs:264-408) and workspace tests
(tests/end_to_end.rs, tests/stress_tests.rs).
"""

import pathlib

import pytest

from zkir_tpu.asm import assemble
from zkir_tpu.runtime import (
    HaltReason,
    Memory,
    VM,
    VMConfig,
    VMState,
    run,
)
from zkir_tpu.runtime.errors import DivisionByZero, InvalidSyscall
from zkir_tpu.runtime.execute import execute
from zkir_tpu.spec import Instruction, Op, Program

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def prog(*instrs) -> Program:
    return Program.from_instructions(list(instrs))


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


class TestExecuteSemantics:
    def setup_method(self):
        self.state = VMState(0)
        self.memory = Memory()

    def _exec(self, inst):
        execute(inst, self.state, self.memory)

    def test_add(self):
        self.state.write_reg(1, 100)
        self.state.write_reg(2, 50)
        self._exec(I(Op.ADD, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 150
        assert self.state.pc == 4

    def test_add_wraps_40_bits(self):
        self.state.write_reg(1, (1 << 40) - 1)
        self.state.write_reg(2, 1)
        self._exec(I(Op.ADD, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 0

    def test_sub(self):
        self.state.write_reg(1, 100)
        self.state.write_reg(2, 30)
        self._exec(I(Op.SUB, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 70

    def test_sub_underflow_wraps(self):
        self.state.write_reg(1, 0)
        self.state.write_reg(2, 1)
        self._exec(I(Op.SUB, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == (1 << 40) - 1

    def test_mulh(self):
        # MULH = bits [40, 80) of the product of RAW register values.
        self.state.write_reg(1, 1 << 39)
        self.state.write_reg(2, 1 << 39)
        self._exec(I(Op.MULH, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 1 << 38

    def test_div_signed_uses_raw_i64(self):
        self.state.write_reg(1, 100)
        self.state.write_reg(2, 7)
        self._exec(I(Op.DIV, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 14
        # A "negative" 40-bit value is NOT sign-extended to i64 — the
        # reference casts the raw u64 (execute.rs:118-119).
        self.state.write_reg(1, (1 << 40) - 1)
        self.state.write_reg(2, 1)
        self._exec(I(Op.DIV, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == (1 << 40) - 1

    def test_rem(self):
        self.state.write_reg(1, 100)
        self.state.write_reg(2, 7)
        self._exec(I(Op.REM, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 2

    def test_div_by_zero(self):
        self.state.write_reg(1, 100)
        with pytest.raises(DivisionByZero):
            self._exec(I(Op.DIV, rd=3, rs1=1, rs2=2))

    def test_logical(self):
        self.state.write_reg(1, 0b1100)
        self.state.write_reg(2, 0b1010)
        self._exec(I(Op.AND, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 0b1000
        self._exec(I(Op.OR, rd=4, rs1=1, rs2=2))
        assert self.state.read_reg(4) == 0b1110
        self._exec(I(Op.XOR, rd=5, rs1=1, rs2=2))
        assert self.state.read_reg(5) == 0b0110

    def test_andi_negative_imm_masks_to_40(self):
        self.state.write_reg(1, (1 << 40) - 1)
        self._exec(I(Op.ANDI, rd=3, rs1=1, imm=-1))
        assert self.state.read_reg(3) == (1 << 40) - 1

    def test_shift_left(self):
        self.state.write_reg(1, 0b11)
        self.state.write_reg(2, 4)
        self._exec(I(Op.SLL, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 0b110000

    def test_shift_out_of_range_gives_zero(self):
        self.state.write_reg(1, 123)
        self.state.write_reg(2, 40)
        self._exec(I(Op.SLL, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 0

    def test_shift_amount_masked_to_6_bits(self):
        self.state.write_reg(1, 1)
        self.state.write_reg(2, 65)  # 65 & 0x3F = 1
        self._exec(I(Op.SLL, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 2

    def test_sra_sign_fill(self):
        neg = (1 << 40) - 4  # -4 at 40 bits
        self.state.write_reg(1, neg)
        self._exec(I(Op.SRAI, rd=3, rs1=1, imm=1))
        assert self.state.read_reg(3) == (1 << 40) - 2  # -2

    def test_slt_signed_at_40_bits(self):
        self.state.write_reg(1, (1 << 40) - 1)  # -1 signed
        self.state.write_reg(2, 1)
        self._exec(I(Op.SLT, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 1
        self._exec(I(Op.SLTU, rd=4, rs1=1, rs2=2))
        assert self.state.read_reg(4) == 0

    def test_cmov(self):
        self.state.write_reg(1, 42)
        self.state.write_reg(2, 1)  # cond != 0
        self.state.write_reg(3, 7)
        self._exec(I(Op.CMOV, rd=3, rs1=1, rs2=2))
        assert self.state.read_reg(3) == 42
        self.state.write_reg(2, 0)
        self.state.write_reg(4, 7)
        self._exec(I(Op.CMOV, rd=4, rs1=1, rs2=2))
        assert self.state.read_reg(4) == 7  # unchanged
        self._exec(I(Op.CMOVZ, rd=4, rs1=1, rs2=2))
        assert self.state.read_reg(4) == 42

    def test_load_store_roundtrip(self):
        self.state.write_reg(1, 0x1000)
        self.state.write_reg(2, 0x12345678)
        self._exec(I(Op.SW, rs1=1, rs2=2, imm=0))
        self._exec(I(Op.LW, rd=3, rs1=1, imm=0))
        assert self.state.read_reg(3) == 0x12345678

    def test_lb_sign_extends_to_64(self):
        self.state.write_reg(1, 0x1000)
        self.state.write_reg(2, 0xFF)
        self._exec(I(Op.SB, rs1=1, rs2=2, imm=0))
        self._exec(I(Op.LB, rd=3, rs1=1, imm=0))
        # Sign-extended through the full 64-bit register (execute.rs:477-487).
        assert self.state.read_reg(3) == (1 << 64) - 1
        self._exec(I(Op.LBU, rd=4, rs1=1, imm=0))
        assert self.state.read_reg(4) == 0xFF

    def test_branch_taken_and_not(self):
        self.state.write_reg(1, 10)
        self.state.write_reg(2, 10)
        self._exec(I(Op.BEQ, rs1=1, rs2=2, imm=100))
        assert self.state.pc == 100
        self.state.pc = 0
        self.state.write_reg(2, 20)
        self._exec(I(Op.BEQ, rs1=1, rs2=2, imm=100))
        assert self.state.pc == 4

    def test_jal_jalr(self):
        self._exec(I(Op.JAL, rd=1, imm=1000))
        assert self.state.read_reg(1) == 4
        assert self.state.pc == 1000
        self.state.pc = 0
        self.state.write_reg(2, 0x2001)
        self._exec(I(Op.JALR, rd=1, rs1=2, imm=0))
        assert self.state.pc == 0x2000  # LSB cleared

    def test_r0_hardwired(self):
        self.state.write_reg(1, 5)
        self._exec(I(Op.ADD, rd=0, rs1=1, rs2=1))
        assert self.state.read_reg(0) == 0

    def test_ebreak(self):
        self._exec(I(Op.EBREAK))
        assert self.state.is_halted
        assert self.state.halt_reason.reason == HaltReason.EBREAK


class TestVMDriver:
    def test_basic_execution(self):
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=10),
            I(Op.ADDI, rd=2, rs1=0, imm=20),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.EBREAK),
        ), [])
        assert result.halt_reason.reason == HaltReason.EBREAK
        assert result.cycles == 4

    def test_exit_syscall(self):
        result = run(prog(
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ADDI, rd=11, rs1=0, imm=42),
            I(Op.ECALL),
        ), [])
        assert result.halt_reason.reason == HaltReason.EXIT
        assert result.halt_reason.code == 42
        assert result.cycles == 3

    def test_io_syscalls(self):
        result = run(prog(
            I(Op.ADDI, rd=10, rs1=0, imm=1),  # READ
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=10, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),  # WRITE
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=0, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=0),  # EXIT
            I(Op.ECALL),
        ), [123])
        assert result.outputs == [123]
        assert result.halt_reason.code == 0

    def test_read_exhausted_returns_zero(self):
        result = run(prog(
            I(Op.ADDI, rd=10, rs1=0, imm=1),
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=10, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),
            I(Op.ECALL),
            I(Op.EBREAK),
        ), [])
        assert result.outputs == [0]

    def test_cycle_limit(self):
        config = VMConfig(max_cycles=100)
        result = run(prog(I(Op.JAL, rd=0, imm=0)), [], config)
        assert result.halt_reason.reason == HaltReason.CYCLE_LIMIT
        assert result.cycles == 100

    def test_branch_skips(self):
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=10),
            I(Op.ADDI, rd=2, rs1=0, imm=10),
            I(Op.BEQ, rs1=1, rs2=2, imm=8),
            I(Op.ADDI, rd=3, rs1=0, imm=99),  # skipped
            I(Op.EBREAK),
        ), [])
        assert result.cycles == 4

    def test_invalid_syscall(self):
        with pytest.raises(InvalidSyscall):
            run(prog(
                I(Op.ADDI, rd=10, rs1=0, imm=999),
                I(Op.ECALL),
            ), [])


class TestExecutionTrace:
    def test_trace_rows_capture_pre_state(self):
        config = VMConfig(enable_execution_trace=True)
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=200),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.EBREAK),
        ), [], config)
        assert len(result.execution_trace) == 4
        first = result.execution_trace[0]
        assert first.cycle == 0
        assert len(first.registers) == 16
        assert len(first.bounds) == 16
        # Row 2 (the ADD) must hold PRE-state: r3 still 0.
        add_row = result.execution_trace[2]
        assert add_row.registers[1] == 100
        assert add_row.registers[2] == 200
        assert add_row.registers[3] == 0
        assert result.execution_trace[3].cycle == 3

    def test_trace_disabled_empty(self):
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.EBREAK),
        ), [])
        assert result.execution_trace == []
        assert result.memory_op_count() == 0

    def test_memory_ops_in_trace(self):
        config = VMConfig(enable_execution_trace=True)
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=0x42),
            I(Op.ADDI, rd=3, rs1=0, imm=0x1000),
            I(Op.SW, rs1=3, rs2=1, imm=0),
            I(Op.LW, rd=4, rs1=3, imm=0),
            I(Op.EBREAK),
        ), [], config)
        assert len(result.execution_trace) == 5
        sw_row = result.execution_trace[2]
        assert len(sw_row.memory_ops) == 1
        assert sw_row.memory_ops[0].is_write
        assert sw_row.memory_ops[0].timestamp == 2
        lw_row = result.execution_trace[3]
        assert len(lw_row.memory_ops) == 1
        assert lw_row.memory_ops[0].is_read
        assert result.execution_trace[0].memory_ops == []
        # Sorted memory trace: 2 data ops, timestamps ascending.
        trace = result.get_memory_trace()
        assert len(trace) == 2
        assert trace[0].timestamp <= trace[1].timestamp

    def test_trace_count_equals_cycles(self):
        # reference end_to_end.rs:261-279
        instrs = [I(Op.ADDI, rd=1, rs1=0, imm=i) for i in range(10)]
        instrs.append(I(Op.EBREAK))
        config = VMConfig(enable_execution_trace=True)
        result = run(prog(*instrs), [], config)
        assert len(result.execution_trace) == result.cycles == 11


class TestRangeChecking:
    def test_accumulated_bounds_trigger_witnesses(self):
        # reference vm.rs:698-752
        instrs = [I(Op.ADDI, rd=1, rs1=0, imm=(1 << 15) - 1)]
        instrs += [I(Op.ADD, rd=1, rs1=1, rs2=1)] * 30
        instrs += [
            I(Op.ADDI, rd=2, rs1=0, imm=0x1000),
            I(Op.SW, rs1=2, rs2=1, imm=0),
            I(Op.EBREAK),
        ]
        config = VMConfig(enable_range_checking=True)
        result = run(prog(*instrs), [], config)
        assert result.halt_reason.reason == HaltReason.EBREAK
        assert len(result.range_check_witnesses) > 0

    def test_small_constants_no_witnesses(self):
        # reference vm.rs:755-806
        config = VMConfig(enable_range_checking=True)
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=200),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.ADDI, rd=4, rs1=0, imm=0x2000),
            I(Op.SW, rs1=4, rs2=3, imm=0),
            I(Op.EBREAK),
        ), [], config)
        assert result.range_check_witnesses == []


class TestFibonacci:
    def test_fibonacci_example_end_to_end(self):
        source = (EXAMPLES / "fibonacci.zkasm").read_text()
        program = assemble(source)
        for n, expected in [(0, 0), (1, 1), (2, 1), (10, 55), (20, 6765)]:
            result = run(program, [n])
            assert result.outputs == [expected], n
            assert result.halt_reason.reason == HaltReason.EXIT
            assert result.halt_reason.code == 0

    def test_fibonacci_cycle_count_deterministic(self):
        source = (EXAMPLES / "fibonacci.zkasm").read_text()
        program = assemble(source)
        # 6 setup/teardown + 5*n loop cycles + fixed overhead; must be
        # deterministic across runs.
        r1 = run(program, [10])
        r2 = run(program, [10])
        assert r1.cycles == r2.cycles

    def test_fibonacci_with_full_witnesses(self):
        source = (EXAMPLES / "fibonacci.zkasm").read_text()
        program = assemble(source)
        config = VMConfig(enable_execution_trace=True,
                          enable_range_checking=True,
                          enable_deferred_model=True)
        result = run(program, [10], config)
        assert result.outputs == [55]
        assert len(result.execution_trace) == result.cycles
        # Deferred model must emit observation-point witnesses at branches.
        assert len(result.normalization_witnesses) > 0
        for event in result.normalization_witnesses:
            assert event.witness.verify()


class TestStress:
    def test_long_program(self):
        # reference stress_tests.rs: 1000-instruction straight-line program
        instrs = [I(Op.ADDI, rd=1 + (i % 15), rs1=0, imm=i % 1000)
                  for i in range(1000)]
        instrs.append(I(Op.EBREAK))
        result = run(prog(*instrs), [])
        assert result.cycles == 1001

    def test_tight_loop(self):
        # countdown loop: r1 = 100; loop: addi r1, r1, -1; bne r1, r0, -4
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=1, rs1=1, imm=-1),
            I(Op.BNE, rs1=1, rs2=0, imm=-4),
            I(Op.EBREAK),
        ), [])
        assert result.cycles == 1 + 100 * 2 + 1

    def test_nested_loops(self):
        # outer 10 x inner 10
        result = run(prog(
            I(Op.ADDI, rd=1, rs1=0, imm=10),   # outer counter
            I(Op.ADDI, rd=2, rs1=0, imm=10),   # inner counter reset
            I(Op.ADDI, rd=3, rs1=3, imm=1),    # body
            I(Op.ADDI, rd=2, rs1=2, imm=-1),
            I(Op.BNE, rs1=2, rs2=0, imm=-8),
            I(Op.ADDI, rd=1, rs1=1, imm=-1),
            I(Op.BNE, rs1=1, rs2=0, imm=-20),
            I(Op.EBREAK),
        ), [])
        # r3 should be 100
        assert result.halt_reason.reason == HaltReason.EBREAK
