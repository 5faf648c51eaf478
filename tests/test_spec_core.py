"""Spec-core parity tests: Config, encoding bitfields, opcodes, program
binary format, Mersenne-31 field.

Vectors extracted from reference tests:
- config: zkir-spec/src/config.rs:240-338
- encoding: zkir-spec/src/encoding.rs:253-341 and tests/cross_module.rs
- program header: zkir-spec/src/program.rs:403-489
- field: zkir-spec/src/field.rs:227-322
"""

import pytest

from zkir_tpu.spec import (
    Config,
    ConfigError,
    FormatMode,
    Instruction,
    M31_PRIME,
    MAGIC,
    Op,
    Program,
    ProgramHeader,
    VERSION,
    encode_btype,
    encode_itype,
    encode_jtype,
    encode_rtype,
    encode_stype,
    extract_imm,
    extract_imm_signed,
    extract_offset,
    extract_opcode,
    extract_rd,
    extract_rs1,
    extract_rs2,
    family_of,
    Family,
    m31_add,
    m31_inv,
    m31_mul,
    m31_neg,
    m31_pow,
    m31_sub,
    uses_immediate,
)


class TestConfig:
    def test_default(self):
        c = Config()
        assert c.limb_bits == 20
        assert c.data_limbs == 2
        assert c.addr_limbs == 2
        assert c.data_bits == 40
        assert c.addr_bits == 40
        assert c.chunk_bits == 10
        assert c.table_size == 1024
        assert c.headroom == 8
        assert c.max_deferred_adds == 256
        assert c.max_deferred_muls == 3

    def test_various_configs(self):
        c = Config(16, 2, 2)
        assert c.data_bits == 32
        assert c.chunk_bits == 8
        assert c.table_size == 256
        assert c.headroom == 0
        assert c.max_deferred_adds == 1
        assert c.max_deferred_muls == 0

        c = Config(30, 2, 2)
        assert c.data_bits == 60
        assert c.chunk_bits == 15
        assert c.table_size == 32768
        assert c.headroom == 28
        assert c.max_deferred_adds == 1 << 28
        assert c.max_deferred_muls == 13

        c = Config(20, 3, 2)
        assert c.data_bits == 60
        assert c.chunk_bits == 10
        assert c.table_size == 1024
        assert c.headroom == 28

    @pytest.mark.parametrize(
        "limb,data,addr",
        [(15, 2, 2), (32, 2, 2), (17, 2, 2), (20, 0, 2), (20, 5, 2),
         (20, 2, 0), (20, 2, 3)],
    )
    def test_invalid(self, limb, data, addr):
        with pytest.raises(ConfigError):
            Config(limb, data, addr)


class TestEncoding:
    def test_extract_registers(self):
        # reference encoding.rs:264-271
        inst = 0x00 | (5 << 7) | (10 << 11) | (15 << 15)
        assert extract_rd(inst) == 5
        assert extract_rs1(inst) == 10
        assert extract_rs2(inst) == 15

    def test_extract_imm(self):
        inst = (0x1234 << 15) | 0x08
        assert extract_imm(inst) == 0x1234

    def test_extract_imm_signed(self):
        inst_pos = (100 << 15) | 0x08
        assert extract_imm_signed(inst_pos) == 100
        inst_neg = (0x1FFFF << 15) | 0x08
        assert extract_imm_signed(inst_neg) == -1

    def test_encode_rtype(self):
        inst = encode_rtype(Op.ADD, 1, 2, 3, 0)
        assert extract_opcode(inst) == Op.ADD
        assert extract_rd(inst) == 1
        assert extract_rs1(inst) == 2
        assert extract_rs2(inst) == 3

    def test_encode_itype(self):
        inst = encode_itype(Op.ADDI, 1, 2, 100)
        assert extract_opcode(inst) == Op.ADDI
        assert extract_rd(inst) == 1
        assert extract_rs1(inst) == 2
        assert extract_imm(inst) == 100

    def test_encode_stype(self):
        inst = encode_stype(Op.SW, 1, 2, 50)
        assert extract_opcode(inst) == Op.SW
        assert (inst >> 7) & 0xF == 1
        assert (inst >> 11) & 0xF == 2
        assert extract_imm(inst) == 50

    def test_encode_jtype(self):
        inst = encode_jtype(Op.JAL, 1, 0x1000)
        assert extract_opcode(inst) == Op.JAL
        assert extract_rd(inst) == 1
        assert extract_offset(inst) == 0x1000

    def test_roundtrip_all_registers(self):
        # reference encoding_tests.rs: roundtrips over all 16 regs
        for r in range(16):
            inst = Instruction(Op.ADD, rd=r, rs1=(r + 1) % 16, rs2=(r + 2) % 16)
            assert Instruction.decode(inst.encode()) == inst

    def test_edge_immediates(self):
        for imm in (0, 1, -1, 100, -100, (1 << 16) - 1, -(1 << 16)):
            inst = Instruction(Op.ADDI, rd=1, rs1=2, imm=imm)
            assert Instruction.decode(inst.encode()).imm == imm

    def test_jal_edge_offsets(self):
        for off in (0, 4, -4, (1 << 20) - 4, -(1 << 20)):
            inst = Instruction(Op.JAL, rd=1, imm=off)
            assert Instruction.decode(inst.encode()).imm == off


class TestOpcodes:
    def test_values(self):
        # reference opcode.rs:590-602
        assert Op.ADD == 0x00
        assert Op.ADDI == 0x08
        assert Op.AND == 0x10
        assert Op.SLL == 0x18
        assert Op.SLTU == 0x20
        assert Op.LB == 0x30
        assert Op.SB == 0x38
        assert Op.BEQ == 0x40
        assert Op.JAL == 0x48
        assert Op.ECALL == 0x50

    def test_families(self):
        assert family_of(Op.ADD) == Family.ARITHMETIC
        assert family_of(Op.ADDI) == Family.ARITHMETIC
        assert family_of(Op.AND) == Family.LOGICAL
        assert family_of(Op.SLL) == Family.SHIFT
        assert family_of(Op.SLT) == Family.COMPARE
        assert family_of(Op.CMOV) == Family.CMOV
        assert family_of(Op.LB) == Family.LOAD
        assert family_of(Op.SB) == Family.STORE
        assert family_of(Op.BEQ) == Family.BRANCH
        assert family_of(Op.JAL) == Family.JUMP
        assert family_of(Op.ECALL) == Family.SYSTEM

    def test_uses_immediate(self):
        assert uses_immediate(Op.ADDI)
        assert uses_immediate(Op.LW)
        assert uses_immediate(Op.SW)
        assert not uses_immediate(Op.ADD)
        assert not uses_immediate(Op.BEQ)

    def test_instruction_count(self):
        assert len(list(Op)) == 50


class TestProgram:
    def test_header_default(self):
        h = ProgramHeader()
        assert h.magic == MAGIC
        assert h.version == VERSION
        assert h.limb_bits == 20
        assert h.data_limbs == 2
        assert h.addr_limbs == 2
        assert h.entry_point == 0x1000
        assert h.stack_size == 1 << 20

    def test_header_bytes_layout(self):
        h = ProgramHeader()
        b = h.to_bytes()
        assert len(b) == 32
        assert b[0:4] == b"ZKIR"
        assert b[4:8] == bytes([0x04, 0x00, 0x03, 0x00])  # 0x00030004 LE
        assert b[8] == 20 and b[9] == 2 and b[10] == 2

    def test_header_roundtrip(self):
        h = ProgramHeader()
        assert ProgramHeader.from_bytes(h.to_bytes()) == h

    def test_header_validation(self):
        h = ProgramHeader()
        h.validate()
        h.magic = 0x12345678
        with pytest.raises(Exception):
            h.validate()
        h.magic = MAGIC
        h.limb_bits = 15
        with pytest.raises(Exception):
            h.validate()

    def test_program_roundtrip(self):
        p = Program()
        p.code = [0x12345678, 0xABCDEF01]
        p.data = bytes([1, 2, 3, 4])
        p.header.code_size = 8
        p.header.data_size = 4
        q = Program.from_bytes(p.to_bytes())
        assert q.header == p.header
        assert q.code == p.code
        assert q.data == p.data

    def test_format_mode(self):
        h = ProgramHeader()
        h.entry_point = 0x1000
        assert FormatMode.detect(h.to_bytes()) == FormatMode.RELEASE
        h.entry_point = 32
        assert FormatMode.detect(h.to_bytes()) == FormatMode.DEBUG
        bad = bytearray(ProgramHeader().to_bytes())
        bad[0] = 0xFF
        assert FormatMode.detect(bytes(bad)) is None
        assert FormatMode.detect(b"\x00" * 10) is None


class TestField:
    def test_prime(self):
        assert M31_PRIME == (1 << 31) - 1

    def test_add_wrap(self):
        assert m31_add(M31_PRIME - 1, 1) == 0
        assert m31_add(M31_PRIME - 1, 2) == 1

    def test_sub_wrap(self):
        assert m31_sub(0, 1) == M31_PRIME - 1
        assert m31_sub(5, 3) == 2

    def test_neg(self):
        assert m31_neg(0) == 0
        assert m31_neg(1) == M31_PRIME - 1
        assert m31_add(12345, m31_neg(12345)) == 0

    def test_mul(self):
        assert m31_mul(2, 3) == 6
        assert m31_mul(M31_PRIME - 1, M31_PRIME - 1) == 1  # (-1)^2 = 1

    def test_fermat_inverse(self):
        # field.rs inverse axioms: a * a^-1 = 1
        for a in (1, 2, 3, 12345, M31_PRIME - 1, 0x12345678 % M31_PRIME):
            assert m31_mul(a, m31_inv(a)) == 1

    def test_pow(self):
        assert m31_pow(2, 10) == 1024
        assert m31_pow(5, 0) == 1
        # Fermat: a^(p-1) = 1
        assert m31_pow(7, M31_PRIME - 1) == 1

    def test_inv_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            m31_inv(0)
