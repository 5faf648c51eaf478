"""Stress tests: large programs, long loops, cycle limits, sparse memory.

Port of `/root/reference/tests/stress_tests.rs:25-519` (16 tests), same
programs (byte-for-byte assembly sources incl. the alias-map quirk:
`t2` = R10 / `a0` = R11 in the assembler ABI) and same assertions, plus
a differential cross-check of the oracle VM against the native C++ VM
on the loop-heavy cases.
"""

import pytest

from zkir_tpu.asm.assembler import assemble
from zkir_tpu.runtime import HaltReason
from zkir_tpu.runtime.vm import VMConfig, run
from zkir_tpu.spec import Instruction, Op, Program


def run_prog(program, inputs=(), max_cycles=1_000_000):
    return run(program, list(inputs), VMConfig(max_cycles=max_cycles))


EXIT_SEQ = [
    Instruction(Op.ADDI, rd=10, rs1=0, imm=0),
    Instruction(Op.ADDI, rd=11, rs1=0, imm=0),
    Instruction(Op.ECALL),
]


class TestLargePrograms:
    def test_1000_instructions(self):
        # stress_tests.rs:25-56
        instructions = [Instruction(Op.ADD, rd=1, rs1=1, rs2=0)
                        for _ in range(1000)] + EXIT_SEQ
        result = run_prog(Program.from_instructions(instructions))
        assert result.halt_reason.reason is HaltReason.EXIT
        assert result.halt_reason.code == 0
        assert result.cycles == 1003  # 1000 adds + 2 addi + ecall

    def test_many_labels_program(self):
        src = "".join(f"label{i}:\n    add r1, r1, r0\n" for i in range(100))
        src += "    ecall\n"
        program = assemble(src)
        assert len(program.code) == 101


class TestLongRunning:
    def test_tight_loop_many_iterations(self):
        source = """
            addi r1, zero, 0        # counter
            addi r2, zero, 10000    # limit

        loop:
            addi r1, r1, 1          # counter++
            bne r1, r2, -4          # loop if counter != limit

            addi t2, zero, 0        # syscall: exit (R10)
            addi a0, zero, 0        # exit code (R11)
            ecall
        """
        result = run_prog(assemble(source))
        assert result.halt_reason.reason is HaltReason.EXIT

    def test_nested_loops(self):
        source = """
            addi r1, zero, 0        # outer counter
            addi r3, zero, 100      # limit

        outer:
            addi r2, zero, 0        # inner counter

        inner:
            addi r2, r2, 1          # inner++
            bne r2, r3, -4          # inner loop

            addi r1, r1, 1          # outer++
            bne r1, r3, -16         # outer loop

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source), max_cycles=100_000)
        assert result.halt_reason.reason is HaltReason.EXIT


class TestCycleLimits:
    def test_cycle_limit_enforcement(self):
        source = "loop:\n    jal zero, 0\n"
        result = run_prog(assemble(source), max_cycles=100)
        assert result.halt_reason.reason is HaltReason.CYCLE_LIMIT
        assert result.cycles == 100

    def test_cycle_limit_exact(self):
        instructions = [Instruction(Op.ADD, rd=0, rs1=0, rs2=0)
                        for _ in range(50)]
        instructions.append(Instruction(Op.EBREAK))
        result = run_prog(Program.from_instructions(instructions),
                          max_cycles=100)
        assert result.halt_reason.reason is HaltReason.EBREAK
        assert result.cycles == 51


class TestMemoryStress:
    def test_many_memory_operations(self):
        lines = ["    addi r1, zero, 0x1000    # base address",
                 "    addi r2, zero, 1         # value"]
        for i in range(100):
            lines.append(f"    sw r2, {i * 4}(r1)")
            lines.append("    addi r2, r2, 1")
        lines += ["    addi t2, zero, 0", "    addi a0, zero, 0",
                  "    ecall"]
        result = run_prog(assemble("\n".join(lines) + "\n"))
        assert result.halt_reason.reason is HaltReason.EXIT

    def test_sparse_memory_access(self):
        source = """
            addi r1, zero, 42

            addi r2, zero, 0x1000
            sw r1, 0(r2)

            addi r2, zero, 0x2000
            sw r1, 0(r2)

            addi r2, zero, 0x3000
            sw r1, 0(r2)

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.halt_reason.reason is HaltReason.EXIT


class TestArithmeticStress:
    def test_repeated_multiplication(self):
        instructions = [
            Instruction(Op.ADDI, rd=1, rs1=0, imm=2),
            Instruction(Op.ADDI, rd=2, rs1=0, imm=1),
        ]
        instructions += [Instruction(Op.MUL, rd=2, rs1=2, rs2=1)
                         for _ in range(20)]
        instructions += EXIT_SEQ
        result = run_prog(Program.from_instructions(instructions))
        assert result.halt_reason.reason is HaltReason.EXIT

    def test_all_arithmetic_ops(self):
        source = """
            addi r1, zero, 100
            addi r2, zero, 7

            add r3, r1, r2      # 107
            sub r4, r1, r2      # 93
            mul r5, r1, r2      # 700
            divu r6, r1, r2     # 14
            remu r7, r1, r2     # 2

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.halt_reason.reason is HaltReason.EXIT


class TestBranchStress:
    def test_many_branches(self):
        lines = ["    addi r1, zero, 0", "    addi r2, zero, 1"]
        for _ in range(50):
            lines.append("    bne r1, r2, 4")     # branch over next
            lines.append("    add r1, r1, r1")    # skipped
        lines += ["    addi t2, zero, 0", "    addi a0, zero, 0",
                  "    ecall"]
        result = run_prog(assemble("\n".join(lines) + "\n"))
        assert result.halt_reason.reason is HaltReason.EXIT

    def test_alternating_branches(self):
        source = """
            addi r1, zero, 1
            addi r2, zero, 0
            addi r3, zero, 50   # iterations

        loop:
            addi r4, r1, 0
            addi r1, r2, 0
            addi r2, r4, 0

            addi r3, r3, -1
            bne r3, zero, -16

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.halt_reason.reason is HaltReason.EXIT


class TestIOStress:
    def test_many_io_operations(self):
        source = """
            addi r3, zero, 5    # count

        loop:
            addi t2, zero, 1        # syscall: read (R10)
            ecall

            addi a0, t2, 0          # a0 = value (R11)
            addi t2, zero, 2        # syscall: write (R10)
            ecall

            addi r3, r3, -1
            bne r3, zero, -24

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source), inputs=[1, 2, 3, 4, 5])
        assert result.outputs == [1, 2, 3, 4, 5]


class TestEdgeCases:
    def test_division_by_one(self):
        source = """
            addi r1, zero, 12345
            addi r2, zero, 1
            divu r3, r1, r2

            addi a0, r3, 0
            addi t2, zero, 2        # syscall: write
            ecall

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.outputs == [12345]

    def test_self_modifying_registers(self):
        source = """
            addi r1, zero, 10
            add r1, r1, r1      # 20
            add r1, r1, r1      # 40
            add r1, r1, r1      # 80

            addi a0, r1, 0
            addi t2, zero, 2
            ecall

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.outputs == [80]

    def test_zero_register_destination(self):
        source = """
            addi zero, zero, 100    # ignored

            addi a0, zero, 0
            addi t2, zero, 2
            ecall

            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """
        result = run_prog(assemble(source))
        assert result.outputs == [0]


class TestStressDifferential:
    """Beyond the reference: the loop-heavy stress programs re-run on the
    native C++ VM must agree with the oracle on cycles/halt/outputs."""

    @pytest.mark.parametrize("name,source,inputs", [
        ("tight_loop", """
            addi r1, zero, 0
            addi r2, zero, 10000
        loop:
            addi r1, r1, 1
            bne r1, r2, -4
            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """, []),
        ("io_loop", """
            addi r3, zero, 5
        loop:
            addi t2, zero, 1
            ecall
            addi a0, t2, 0
            addi t2, zero, 2
            ecall
            addi r3, r3, -1
            bne r3, zero, -24
            addi t2, zero, 0
            addi a0, zero, 0
            ecall
        """, [9, 8, 7, 6, 5]),
    ])
    def test_native_agrees(self, name, source, inputs):
        from zkir_tpu.runtime import native_vm
        if not native_vm.available():
            pytest.skip("native VM not built")
        program = assemble(source)
        oracle = run_prog(program, inputs=inputs)
        nat = native_vm.run_native(program, list(inputs))
        assert nat.cycles == oracle.cycles
        assert nat.outputs == oracle.outputs
        assert nat.halt == 2  # HALT_EXIT
        assert nat.exit_code == oracle.halt_reason.code
