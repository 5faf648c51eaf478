"""Assembler/disassembler parity tests.

Vector sources: reference zkir-assembler/tests/integration_tests.rs (every
mnemonic assembles + decoder roundtrip), malformed_input.rs (operand-count /
register errors), zkir-disassembler/tests/integration_tests.rs (formatting),
and tests/end_to_end.rs (assemble -> disassemble text roundtrips).
"""

import pytest

from zkir_tpu.asm import AssemblerError, assemble, decode, disassemble, format_instruction
from zkir_tpu.spec import Config, Instruction, Op, Program


class TestAssembleBasics:
    def test_simple(self):
        program = assemble("ecall\nebreak\n")
        assert program.code == [0x50, 0x51]
        assert program.header.code_size == 8

    def test_with_config(self):
        program = assemble(
            ".config limb_bits 20\n"
            ".config data_limbs 2\n"
            ".config addr_limbs 2\n"
            "add r1, r2, r3\n"
            "ecall\n"
        )
        assert len(program.code) == 2
        assert program.config() == Config(20, 2, 2)

    def test_config_changes_header(self):
        program = assemble(".config limb_bits 16\nadd r1, r2, r3\n")
        assert program.header.limb_bits == 16
        assert program.config().data_bits == 32

    def test_invalid_config(self):
        with pytest.raises(AssemblerError):
            assemble(".config limb_bits 15\n")
        with pytest.raises(AssemblerError):
            assemble(".config data_limbs 5\n")
        with pytest.raises(AssemblerError):
            assemble(".config bogus 1\n")

    def test_comments_and_blanks(self):
        program = assemble(
            "# full line comment\n"
            "\n"
            "add r1, r2, r3  # trailing comment\n"
        )
        assert len(program.code) == 1

    def test_labels_collected(self):
        program = assemble(
            "start:\n"
            "    add a0, zero, zero\n"
            "    beq a0, zero, 8\n"
            "    add a1, zero, zero\n"
            "end:\n"
            "    ebreak\n"
        )
        assert len(program.code) == 4

    def test_label_resolution_extension(self):
        # Label branch targets resolve to relative byte offsets (our
        # deliberate fix of the reference's unused label table).
        program = assemble(
            "    addi r1, r0, 1\n"
            "loop:\n"
            "    addi r1, r1, 1\n"
            "    bne r1, r2, loop\n"
            "    ebreak\n"
        )
        # bne at pc=0x1008, loop at 0x1004 => offset -4
        inst = decode(program.code[2])
        assert inst.op == Op.BNE
        assert inst.imm == -4

    def test_duplicate_label(self):
        with pytest.raises(AssemblerError):
            assemble("a:\na:\n")

    def test_undefined_label(self):
        with pytest.raises(AssemblerError):
            assemble("beq r1, r2, nowhere\n")


class TestAllMnemonics:
    R_TYPE = ["add", "sub", "mul", "mulh", "div", "divu", "rem", "remu",
              "and", "or", "xor", "sll", "srl", "sra", "slt", "sltu",
              "sge", "sgeu", "seq", "sne", "cmov", "cmovz", "cmovnz"]
    I_TYPE = ["addi", "andi", "ori", "xori"]
    SHIFTS = ["slli", "srli", "srai"]
    LOADS = ["lb", "lbu", "lh", "lhu", "lw", "ld"]
    STORES = ["sb", "sh", "sw", "sd"]
    BRANCHES = ["beq", "bne", "blt", "bge", "bltu", "bgeu"]

    @pytest.mark.parametrize("m", R_TYPE)
    def test_r_type_roundtrip(self, m):
        program = assemble(f"{m} r1, r2, r3\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        assert (inst.rd, inst.rs1, inst.rs2) == (1, 2, 3)

    @pytest.mark.parametrize("m", I_TYPE)
    def test_i_type_roundtrip(self, m):
        program = assemble(f"{m} r1, r2, -42\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        assert (inst.rd, inst.rs1, inst.imm) == (1, 2, -42)

    @pytest.mark.parametrize("m", SHIFTS)
    def test_shift_roundtrip(self, m):
        program = assemble(f"{m} r1, r2, 7\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        assert (inst.rd, inst.rs1, inst.imm) == (1, 2, 7)

    @pytest.mark.parametrize("m", LOADS)
    def test_load_roundtrip(self, m):
        program = assemble(f"{m} r1, 16(r2)\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        assert (inst.rd, inst.rs1, inst.imm) == (1, 2, 16)

    @pytest.mark.parametrize("m", STORES)
    def test_store_roundtrip(self, m):
        program = assemble(f"{m} r1, 16(r2)\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        # store text is "rs2, offset(rs1)"
        assert (inst.rs2, inst.rs1, inst.imm) == (1, 2, 16)

    @pytest.mark.parametrize("m", BRANCHES)
    def test_branch_roundtrip(self, m):
        program = assemble(f"{m} r1, r2, -8\n")
        inst = decode(program.code[0])
        assert inst.mnemonic == m
        assert (inst.rs1, inst.rs2, inst.imm) == (1, 2, -8)

    def test_jal_jalr(self):
        program = assemble("jal r1, 100\njalr r1, r2, 4\n")
        jal = decode(program.code[0])
        assert (jal.op, jal.rd, jal.imm) == (Op.JAL, 1, 100)
        jalr = decode(program.code[1])
        assert (jalr.op, jalr.rd, jalr.rs1, jalr.imm) == (Op.JALR, 1, 2, 4)

    def test_assembler_alias_map(self):
        # The assembler alias map sends a0 -> r11 (parser.rs:43), which is
        # deliberately different from the spec display map (a0 = r4).
        program = assemble("add a0, t0, s0\n")
        inst = decode(program.code[0])
        assert (inst.rd, inst.rs1, inst.rs2) == (11, 8, 6)


class TestMalformedInput:
    @pytest.mark.parametrize("src", [
        "add r1, r2\n",            # too few operands
        "add r1, r2, r3, r4\n",    # too many
        "add r1 r2 r3\n",          # missing commas
        "add r1, r2, 5\n",         # number where register expected
        "addi r1, r2, r3\n",       # register where number expected
        "lw r1, r2, 4\n",          # wrong load shape
        "bogus r1, r2, r3\n",      # unknown mnemonic
        "add r16, r2, r3\n",       # invalid register
        "ecall r1\n",              # operands on ecall
    ])
    def test_rejected(self, src):
        with pytest.raises(AssemblerError):
            assemble(src)


class TestEncoderVectors:
    def test_encode_matches_reference_layout(self):
        # ADD r4, r5, r6: opcode 0x00, rd=4, rs1=5, rs2=6
        inst = Instruction(Op.ADD, rd=4, rs1=5, rs2=6)
        word = inst.encode()
        assert word == (4 << 7) | (5 << 11) | (6 << 15)

    def test_ecall_ebreak_words(self):
        assert Instruction(Op.ECALL).encode() == 0x50
        assert Instruction(Op.EBREAK).encode() == 0x51

    def test_negative_imm_mask(self):
        # ADDI r1, r0, -1: imm field = 0x1FFFF
        word = Instruction(Op.ADDI, rd=1, rs1=0, imm=-1).encode()
        assert (word >> 15) & 0x1FFFF == 0x1FFFF

    def test_encode_decode_identity_all_opcodes(self):
        # reference tests/cross_module.rs:195-227
        for op in Op:
            if op in (Op.ECALL, Op.EBREAK):
                inst = Instruction(op)
            elif op == Op.JAL:
                inst = Instruction(op, rd=3, imm=-16)
            elif op in (Op.SLLI, Op.SRLI, Op.SRAI):
                inst = Instruction(op, rd=3, rs1=4, imm=9)
            elif op in (Op.SB, Op.SH, Op.SW, Op.SD,
                        Op.BEQ, Op.BNE, Op.BLT, Op.BGE, Op.BLTU, Op.BGEU):
                inst = Instruction(op, rs1=3, rs2=4, imm=-8)
            elif op in (Op.ADDI, Op.ANDI, Op.ORI, Op.XORI, Op.JALR,
                        Op.LB, Op.LBU, Op.LH, Op.LHU, Op.LW, Op.LD):
                inst = Instruction(op, rd=3, rs1=4, imm=-8)
            else:
                inst = Instruction(op, rd=3, rs1=4, rs2=5)
            assert Instruction.decode(inst.encode()) == inst, op


class TestDisassembler:
    def test_formatting_uses_spec_names(self):
        # formatter.rs:189-196: ADD r4, r5, r6 formats as "add a0, a1, a2"
        assert format_instruction(Instruction(Op.ADD, rd=4, rs1=5, rs2=6)) \
            == "add a0, a1, a2"
        assert format_instruction(Instruction(Op.ADDI, rd=4, rs1=5, imm=100)) \
            == "addi a0, a1, 100"
        assert format_instruction(Instruction(Op.LW, rd=4, rs1=2, imm=16)) \
            == "lw a0, 16(sp)"
        assert format_instruction(Instruction(Op.SW, rs1=2, rs2=4, imm=16)) \
            == "sw a0, 16(sp)"
        assert format_instruction(Instruction(Op.BEQ, rs1=4, rs2=5, imm=8)) \
            == "beq a0, a1, 8"
        assert format_instruction(Instruction(Op.JAL, rd=1, imm=100)) \
            == "jal ra, 100"
        assert format_instruction(Instruction(Op.JALR, rd=1, rs1=2, imm=0)) \
            == "jalr ra, 0(sp)"
        assert format_instruction(Instruction(Op.SLLI, rd=4, rs1=5, imm=5)) \
            == "slli a0, a1, 5"
        assert format_instruction(Instruction(Op.ADDI, rd=4, rs1=5, imm=-1)) \
            == "addi a0, a1, -1"

    def test_listing_layout(self):
        program = Program()
        program.code = [0x50, 0x51]
        program.header.code_size = 8
        text = disassemble(program)
        assert "; ZKIR v3.4 Disassembly" in text
        assert ";   Limb bits:  20" in text
        assert "; Entry point: 0x00001000" in text
        assert "0x00001000:  00000050  ecall" in text
        assert "0x00001004:  00000051  ebreak" in text

    def test_assemble_disassemble_roundtrip(self):
        src = (
            "addi r1, r0, 10\n"
            "addi r2, r0, 20\n"
            "add r3, r1, r2\n"
            "sw r3, 0(r2)\n"
            "beq r1, r2, 8\n"
            "ebreak\n"
        )
        program = assemble(src)
        text = disassemble(program)
        # Re-assembling the instruction text from the listing must produce
        # the same code words (names swap alias map, so compare decoded).
        for word in program.code:
            inst = decode(word)
            assert inst.encode() == word
        assert "ebreak" in text
