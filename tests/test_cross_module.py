"""Workspace-level cross-module parity tests.

Vector source: reference tests/cross_module.rs (encode->decode identity,
edge immediates, config preservation through the pipeline, trace roundtrip)
and tests/end_to_end.rs (assemble -> run -> disassemble text roundtrips).
"""

import numpy as np

from zkir_tpu.asm import assemble, decode, disassemble
from zkir_tpu.runtime import VM, VMConfig, run
from zkir_tpu.spec import Config, Instruction, Op, Program


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


class TestEncodeDecodeIdentity:
    def test_edge_immediates_survive_pipeline(self):
        # cross_module.rs: extreme immediates through encode->decode.
        cases = [
            I(Op.ADDI, rd=15, rs1=15, imm=(1 << 16) - 1),
            I(Op.ADDI, rd=1, rs1=2, imm=-(1 << 16)),
            I(Op.BEQ, rs1=15, rs2=14, imm=-(1 << 16)),
            I(Op.JAL, rd=15, imm=(1 << 20) - 4),
            I(Op.JAL, rd=1, imm=-(1 << 20)),
            I(Op.SD, rs1=15, rs2=15, imm=(1 << 16) - 1),
        ]
        for inst in cases:
            assert Instruction.decode(inst.encode()) == inst

    def test_config_preserved_through_binary(self):
        # cross_module.rs: .config directives survive serialize/deserialize.
        program = assemble(
            ".config limb_bits 24\n.config data_limbs 3\n"
            "addi r1, r0, 5\nebreak\n"
        )
        restored = Program.from_bytes(program.to_bytes())
        assert restored.config() == Config(24, 3, 2)
        assert restored.code == program.code

    def test_disassembly_reassembles_identically(self):
        # end_to_end.rs: text roundtrip — strip comments, re-assemble the
        # instruction text, compare code words (display names map through
        # the spec alias table; reassembly maps through the assembler
        # table, so compare decoded instructions).
        program = assemble(
            "addi r1, r0, 10\n"
            "addi r2, r0, 32\n"
            "mul r3, r1, r2\n"
            "sw r3, 0(r2)\n"
            "lw r4, 0(r2)\n"
            "bne r4, r3, 8\n"
            "jal r5, 8\n"
            "ebreak\n"
        )
        listing = disassemble(program)
        body = [line.split("  ", 2)[2] for line in listing.splitlines()
                if line.startswith("0x")]
        # Decoded form of each line must match the original instruction.
        for text, word in zip(body, program.code):
            inst = decode(word)
            assert inst.format() == text

    def test_trace_roundtrip_structure(self):
        # cross_module.rs:444-468 — per-row trace structure checks.
        program = Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.SW, rs1=0, rs2=1, imm=0x2000),
            I(Op.LW, rd=2, rs1=0, imm=0x2000),
            I(Op.EBREAK),
        ])
        result = run(program, [], VMConfig(enable_execution_trace=True))
        assert len(result.execution_trace) == result.cycles == 4
        for i, row in enumerate(result.execution_trace):
            assert row.cycle == i
            assert row.pc == 0x1000 + 4 * i
            assert row.instruction == program.code[i]
            assert len(row.registers) == 16
            assert len(row.bounds) == 16
            assert len(row.register_states) == 16
        assert result.execution_trace[1].memory_ops[0].is_write
        assert result.execution_trace[2].memory_ops[0].is_read


class TestEndToEndPrograms:
    def test_assemble_run_cycle_counts(self):
        # end_to_end.rs: assemble -> run -> exact cycle count.
        program = assemble(
            "addi r1, r0, 5\n"
            "loop:\n"
            "addi r1, r1, -1\n"
            "bne r1, r0, loop\n"
            "ebreak\n"
        )
        result = run(program, [])
        assert result.cycles == 1 + 5 * 2 + 1

    def test_memory_program_via_all_engines(self):
        src = (
            "addi r1, r0, 0x2000\n"
            "addi r2, r0, 1234\n"
            "sw r2, 0(r1)\n"
            "lw r3, 0(r1)\n"
            "addi r11, r3, 0\n"
            "addi r10, r0, 2\n"
            "ecall\n"
            "ebreak\n"
        )
        program = assemble(src)
        oracle = run(program, [])
        assert oracle.outputs == [1234]

        from zkir_tpu.runtime.native_vm import available, run_native
        if available():
            native = run_native(program, [])
            assert native.outputs == [1234]
            assert native.cycles == oracle.cycles

        from zkir_tpu.interp import InterpConfig, TpuInterpreter
        interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=32))
        device = interp.run([[]])
        assert [int(x) for x in device["outputs"][0]] == [1234]
        assert int(device["cycles"][0]) == oracle.cycles
