"""Disassembler decode/format family matrix.

Port of `/root/reference/zkir-disassembler/tests/integration_tests.rs`
(40 tests): per-family decode checks over raw words, format checks
(ABI register names), listing-output checks, roundtrips with the
encoder, and edge immediates.
"""

import pytest

from zkir_tpu.asm.disassembler import decode, disassemble, format_instruction
from zkir_tpu.spec import Config, Instruction, Op, Program
from zkir_tpu.spec.isa import DecodeError


def word_r(op, rd=1, rs1=2, rs2=3):
    return op | (rd << 7) | (rs1 << 11) | (rs2 << 15)


def word_i(op, rd=1, rs1=2, imm=0):
    return op | (rd << 7) | (rs1 << 11) | ((imm & 0x1FFFF) << 15)


class TestDecodeFamilies:
    @pytest.mark.parametrize("op", [Op.ADD, Op.SUB, Op.MUL, Op.MULH,
                                    Op.DIV, Op.DIVU, Op.REM, Op.REMU])
    def test_decode_all_arithmetic(self, op):
        inst = decode(word_r(op.value))
        assert inst.op is op
        assert (inst.rd, inst.rs1, inst.rs2) == (1, 2, 3)

    @pytest.mark.parametrize("op", [Op.AND, Op.OR, Op.XOR])
    def test_decode_all_logical(self, op):
        inst = decode(word_r(op.value))
        assert inst.op is op

    @pytest.mark.parametrize("op", [Op.SLL, Op.SRL, Op.SRA])
    def test_decode_all_shifts(self, op):
        inst = decode(word_r(op.value))
        assert inst.op is op

    @pytest.mark.parametrize("op", [Op.SLT, Op.SLTU, Op.SGE, Op.SGEU,
                                    Op.SEQ, Op.SNE])
    def test_decode_all_compares(self, op):
        inst = decode(word_r(op.value))
        assert inst.op is op

    @pytest.mark.parametrize("op", [Op.CMOV, Op.CMOVZ, Op.CMOVNZ])
    def test_decode_all_cmov(self, op):
        inst = decode(word_r(op.value))
        assert inst.op is op

    def test_decode_addi(self):
        inst = decode(word_i(Op.ADDI.value, imm=100))
        assert (inst.op, inst.rd, inst.rs1, inst.imm) == (Op.ADDI, 1, 2, 100)

    def test_decode_addi_negative(self):
        # imm = -1 in 17-bit two's complement
        inst = decode(word_i(Op.ADDI.value, imm=0x1FFFF))
        assert inst.imm == -1

    @pytest.mark.parametrize("op", [Op.ANDI, Op.ORI, Op.XORI])
    def test_decode_all_logical_immediate(self, op):
        inst = decode(word_i(op.value, imm=0xFF))
        assert inst.op is op and inst.imm == 0xFF

    @pytest.mark.parametrize("op", [Op.SLLI, Op.SRLI, Op.SRAI])
    def test_decode_shift_immediate(self, op):
        inst = decode(word_i(op.value, imm=5))
        assert inst.op is op and inst.imm == 5

    @pytest.mark.parametrize("op", [Op.LB, Op.LBU, Op.LH, Op.LHU,
                                    Op.LW, Op.LD])
    def test_decode_all_loads(self, op):
        inst = decode(word_i(op.value, imm=16))
        assert inst.op is op and inst.imm == 16

    @pytest.mark.parametrize("op", [Op.SB, Op.SH, Op.SW, Op.SD])
    def test_decode_all_stores(self, op):
        # S-type: rs1 (base) at the rd bit position (encoding.rs:142-159)
        word = op.value | (2 << 7) | (1 << 11) | (16 << 15)
        inst = decode(word)
        assert inst.op is op
        assert (inst.rs1, inst.rs2, inst.imm) == (2, 1, 16)

    @pytest.mark.parametrize("op", [Op.BEQ, Op.BNE, Op.BLT, Op.BGE,
                                    Op.BLTU, Op.BGEU])
    def test_decode_all_branches(self, op):
        word = op.value | (1 << 7) | (2 << 11) | (8 << 15)
        inst = decode(word)
        assert inst.op is op
        assert (inst.rs1, inst.rs2, inst.imm) == (1, 2, 8)

    def test_decode_branch_negative_offset(self):
        word = Op.BEQ.value | (1 << 7) | (2 << 11) | (0x1FFF8 << 15)
        inst = decode(word)
        assert inst.imm == -8

    def test_decode_jal(self):
        word = Op.JAL.value | (1 << 7) | (100 << 11)
        inst = decode(word)
        assert (inst.op, inst.rd, inst.imm) == (Op.JAL, 1, 100)

    def test_decode_jalr(self):
        inst = decode(word_i(Op.JALR.value, imm=100))
        assert (inst.op, inst.rd, inst.rs1, inst.imm) == (Op.JALR, 1, 2, 100)

    def test_decode_ecall(self):
        assert decode(Op.ECALL.value).op is Op.ECALL

    def test_decode_ebreak(self):
        assert decode(Op.EBREAK.value).op is Op.EBREAK


class TestDecodeErrors:
    def test_decode_unknown_opcode(self):
        with pytest.raises(DecodeError) as ei:
            decode(0x7F)
        assert "0x7f" in str(ei.value).lower()

    @pytest.mark.parametrize("opcode", [0x52, 0x53, 0x60, 0x7F])
    def test_decode_invalid_opcodes(self, opcode):
        with pytest.raises(DecodeError):
            decode(opcode)


class TestFormat:
    def test_format_r_type(self):
        s = format_instruction(Instruction(Op.ADD, rd=1, rs1=2, rs2=3))
        assert "add" in s
        # ABI display names: R1=ra, R2=sp, R3=fp (register.rs:14-61 map)
        assert "ra" in s and "sp" in s and "fp" in s

    def test_format_i_type(self):
        s = format_instruction(Instruction(Op.ADDI, rd=1, rs1=2, imm=100))
        assert "addi" in s and "ra" in s and "sp" in s and "100" in s

    def test_format_negative_immediate(self):
        s = format_instruction(Instruction(Op.ADDI, rd=1, rs1=2, imm=-50))
        assert "-50" in s

    def test_format_load(self):
        s = format_instruction(Instruction(Op.LW, rd=1, rs1=2, imm=16))
        assert "lw" in s and "16" in s and "(" in s

    def test_format_store(self):
        s = format_instruction(Instruction(Op.SW, rs1=2, rs2=1, imm=16))
        assert "sw" in s

    def test_format_branch(self):
        s = format_instruction(Instruction(Op.BEQ, rs1=1, rs2=2, imm=8))
        assert "beq" in s and "8" in s

    def test_format_system(self):
        assert "ecall" in format_instruction(Instruction(Op.ECALL))
        assert "ebreak" in format_instruction(Instruction(Op.EBREAK))


class TestDisassembleListing:
    def test_disassemble_empty_program(self):
        out = disassemble(Program.from_instructions([]))
        assert "ZKIR v3.4" in out
        assert "0 instructions" in out

    def test_disassemble_single_instruction(self):
        out = disassemble(Program.from_instructions([Instruction(Op.ECALL)]))
        assert "ecall" in out and "1 instructions" in out

    def test_disassemble_multiple_instructions(self):
        out = disassemble(Program.from_instructions([
            Instruction(Op.ADD, rd=1, rs1=2, rs2=3),
            Instruction(Op.ECALL),
        ]))
        assert "add" in out and "ecall" in out and "2 instructions" in out

    def test_disassemble_with_config(self):
        prog = Program.from_instructions(
            [Instruction(Op.ECALL)],
            config=Config(limb_bits=20, data_limbs=2, addr_limbs=2))
        out = disassemble(prog)
        assert "Limb bits:  20" in out
        assert "Data limbs: 2" in out
        assert "40-bit" in out

    def test_disassemble_shows_addresses(self):
        out = disassemble(Program.from_instructions(
            [Instruction(Op.ECALL), Instruction(Op.EBREAK)]))
        assert "0x00001000:" in out and "0x00001004:" in out

    def test_disassemble_shows_hex_encoding(self):
        out = disassemble(Program.from_instructions([Instruction(Op.ECALL)]))
        assert "00000050" in out


class TestRoundtrips:
    def test_decode_encode_roundtrip(self):
        original = Instruction(Op.ADD, rd=5, rs1=10, rs2=15)
        assert decode(original.encode()) == original

    def test_decode_encode_all_registers(self):
        # all 16^3 register combinations through ADD
        for rd in range(16):
            for rs1 in range(16):
                for rs2 in range(16):
                    word = word_r(Op.ADD.value, rd, rs1, rs2)
                    inst = decode(word)
                    assert (inst.rd, inst.rs1, inst.rs2) == (rd, rs1, rs2)

    @pytest.mark.parametrize("imm", [-65536, -1000, -1, 0, 1, 1000, 65535])
    def test_decode_encode_immediate_range(self, imm):
        original = Instruction(Op.ADDI, rd=1, rs1=2, imm=imm)
        assert decode(original.encode()) == original


class TestEdgeCases:
    def test_decode_max_register_values(self):
        inst = decode(word_r(Op.ADD.value, 15, 15, 15))
        assert (inst.rd, inst.rs1, inst.rs2) == (15, 15, 15)

    def test_decode_zero_register(self):
        inst = decode(word_r(Op.ADD.value, 0, 0, 0))
        assert (inst.rd, inst.rs1, inst.rs2) == (0, 0, 0)

    def test_decode_max_jal_offset(self):
        word = Op.JAL.value | (1 << 7) | (0xFFFFF << 11)
        assert decode(word).imm > 0

    def test_decode_min_jal_offset(self):
        word = Op.JAL.value | (1 << 7) | (0x100000 << 11)
        assert decode(word).imm < 0

    def test_disassemble_complete_program(self):
        out = disassemble(Program.from_instructions([
            Instruction(Op.ADDI, rd=1, rs1=0, imm=10),
            Instruction(Op.ADDI, rd=2, rs1=0, imm=20),
            Instruction(Op.ADD, rd=3, rs1=1, rs2=2),
            Instruction(Op.ECALL),
        ]))
        assert "addi" in out and "add" in out and "ecall" in out
        assert "4 instructions" in out and "16 bytes" in out
