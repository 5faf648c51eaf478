"""Tests for GenericValue, observation tables, and the static analyzer."""

import pytest

from zkir_tpu.runtime.observation import (
    InstructionCategory,
    can_defer_output,
    categorize_instruction,
    get_normalize_sources,
    is_observation_point,
)
from zkir_tpu.spec import Instruction, Op
from zkir_tpu.spec.analyzer import RangeCheckReason, analyze_program
from zkir_tpu.spec.values import GenericValue, Value30, Value40, Value60, Value64


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


class TestGenericValue:
    """Vectors from reference zkir-spec value.rs tests and
    zkir-spec/tests/value_types.rs (overflow/underflow/cross-limb)."""

    def test_roundtrip(self):
        v = Value40.from_u64(0x123456789)
        assert v.to_u64() == 0x123456789

    def test_class_caching(self):
        assert GenericValue(20, 2) is Value40
        assert Value40.TOTAL_BITS == 40
        assert Value60.TOTAL_BITS == 60
        assert Value30.TOTAL_BITS == 30
        assert Value64.TOTAL_BITS == 64

    def test_wrapping_add_overflow(self):
        v = Value40.max_value().wrapping_add(Value40.from_u64(1))
        assert v.to_u64() == 0

    def test_wrapping_sub_underflow(self):
        v = Value40.from_u64(0).wrapping_sub(Value40.from_u64(1))
        assert v.to_u64() == (1 << 40) - 1

    def test_cross_limb_carry(self):
        # (2^20 - 1) + 1 carries into limb 1
        v = Value40.from_u64((1 << 20) - 1).wrapping_add(Value40.from_u64(1))
        assert v.limbs == [0, 1]

    def test_mul_wraps_at_total_bits(self):
        v = Value40.from_u64(1 << 30).wrapping_mul(Value40.from_u64(1 << 30))
        assert v.to_u64() == (1 << 60) & ((1 << 40) - 1)

    def test_value60_wider_than_40(self):
        v = Value60.from_int(1 << 50)
        assert v.to_int() == 1 << 50
        assert v.limbs == [0, 0, 1 << 10]

    def test_bitwise_per_limb(self):
        a = Value40.from_u64(0xF0F0F0F0F0 & ((1 << 40) - 1))
        b = Value40.from_u64(0xFF00FF00FF & ((1 << 40) - 1))
        assert a.bitwise_and(b).to_u64() == (a.to_u64() & b.to_u64())
        assert a.bitwise_or(b).to_u64() == (a.to_u64() | b.to_u64())
        assert a.bitwise_xor(b).to_u64() == (a.to_u64() ^ b.to_u64())
        assert a.bitwise_not().to_u64() == (~a.to_u64()) & ((1 << 40) - 1)

    def test_shift_semantics(self):
        v = Value40.from_u64(0b11)
        assert v.left_shift(4).to_u64() == 0b110000
        assert v.left_shift(40).to_u64() == 0
        assert Value40.from_u64(1 << 39).right_shift(39).to_u64() == 1
        # arithmetic shift sign fill at 40 bits
        neg = Value40.from_u64((1 << 40) - 4)  # -4
        assert neg.arithmetic_right_shift(1, 40).to_u64() == (1 << 40) - 2

    def test_signed_compare_xor_trick(self):
        neg1 = Value40.from_u64((1 << 40) - 1)
        one = Value40.from_u64(1)
        assert neg1.signed_lt(one, 40)
        assert not one.signed_lt(neg1, 40)
        assert not neg1.unsigned_lt(one)

    def test_extension_truncation(self):
        v = Value40.from_u64(0x80)
        assert v.sign_extend(8, 16).to_u64() == 0xFF80
        assert Value40.from_u64(0xFF80).zero_extend(8).to_u64() == 0x80
        assert Value40.from_u64(0x12345).truncate(8).to_u64() == 0x45
        assert v.fits_in(8)
        assert not v.fits_in(7)

    def test_value40_generic_equivalence(self):
        # value.rs:1101-1121: Value40 and GenericValue<20, 2> agree.
        for x in (0, 1, (1 << 40) - 1, 0xABCDE12345 & ((1 << 40) - 1)):
            assert GenericValue(20, 2).from_u64(x).to_u64() == x


class TestObservation:
    def test_observation_points(self):
        # reference observation.rs:24-50
        for op in (Op.BEQ, Op.SLT, Op.SW, Op.AND, Op.SLLI, Op.MUL, Op.DIVU):
            assert is_observation_point(op)
        for op in (Op.ADD, Op.SUB, Op.ADDI, Op.SD, Op.LD, Op.JAL, Op.ECALL):
            assert not is_observation_point(op)

    def test_normalize_sources(self):
        assert get_normalize_sources(Op.BEQ, 1, 2) == [1, 2]
        assert get_normalize_sources(Op.ANDI, 1, 2) == [1]
        assert get_normalize_sources(Op.LW, 1, 2) == [1]
        assert get_normalize_sources(Op.SW, 1, 2) == [1, 2]
        assert get_normalize_sources(Op.ADD, 1, 2) == []

    def test_can_defer(self):
        assert can_defer_output(Op.ADD)
        assert can_defer_output(Op.MUL)
        assert not can_defer_output(Op.AND)

    def test_categorize(self):
        assert categorize_instruction(Op.ADD) \
            == InstructionCategory.DEFERRED_ARITHMETIC
        assert categorize_instruction(Op.BEQ) \
            == InstructionCategory.OBSERVATION_POINT
        assert categorize_instruction(Op.JAL) == InstructionCategory.OTHER


class TestAnalyzer:
    def test_division_always_checked(self):
        analysis = analyze_program([
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=7),
            I(Op.DIV, rd=3, rs1=1, rs2=2),
            I(Op.EBREAK),
        ])
        reasons = [r for _, _, r in analysis.required_checks]
        assert RangeCheckReason.DIVISION_QUOTIENT in reasons

    def test_loads_checked(self):
        analysis = analyze_program([
            I(Op.LW, rd=1, rs1=0, imm=0x2000),
            I(Op.EBREAK),
        ])
        assert analysis.required_checks[0][2] == RangeCheckReason.MEMORY_LOAD

    def test_ecall_checked(self):
        analysis = analyze_program([I(Op.ECALL)])
        assert analysis.required_checks[0] == (
            0, 10, RangeCheckReason.EXTERNAL_INPUT)

    def test_constant_arithmetic_elided(self):
        # Small constants never exceed 40 bits: everything elided.
        analysis = analyze_program([
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=200),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.SUB, rd=4, rs1=3, rs2=1),
            I(Op.EBREAK),
        ])
        assert analysis.check_count == 0
        assert analysis.elision_ratio == 1.0

    def test_accumulating_adds_eventually_checked(self):
        instrs = [I(Op.ADD, rd=1, rs1=1, rs2=1)] * 45 + [I(Op.EBREAK)]
        analysis = analyze_program(instrs)
        # Program-width inputs: add chain exceeds 40 bits immediately.
        assert analysis.check_count > 0
        mask = analysis.check_mask()
        assert len(mask) == len(instrs)
        assert any(mask)

    def test_bounds_recorded_per_pc(self):
        analysis = analyze_program([
            I(Op.ADDI, rd=1, rs1=0, imm=255),
            I(Op.EBREAK),
        ])
        assert len(analysis.bounds_after) == 2
        assert analysis.bounds_after[0][1] == 9  # max(0,8)+1 bits
