"""Deferred-carry model parity tests.

Vector sources: reference zkir-runtime/src/deferred.rs:276-397,
normalize.rs:274-360 (incl. the [1081328, 1048575] two's-complement wrap
case), state.rs:374-407, and tests/deferred_integration_test.rs (deferred
ADD then branch normalizes correctly).
"""

from zkir_tpu.runtime import DeferredConfig, VMConfig, VMState, run
from zkir_tpu.runtime.deferred import (
    execute_add_deferred,
    execute_addi_deferred,
    execute_sub_deferred,
)
from zkir_tpu.runtime.normalize import (
    normalize_register,
    would_overflow,
)
from zkir_tpu.runtime.state import RegState
from zkir_tpu.spec import Instruction, Op, Program


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


CFG = DeferredConfig()


class TestDeferredConfig:
    def test_defaults(self):
        assert CFG.normalized_bits == 20
        assert CFG.limb_bits == 30
        assert CFG.headroom_bits == 10
        assert CFG.max_deferred_ops == 1024


class TestDeferredOps:
    def test_add_simple(self):
        state = VMState(0)
        state.write_reg_from_limbs(1, [100, 0], 20)
        state.write_reg_from_limbs(2, [200, 0], 20)
        execute_add_deferred(state, 3, 1, 2, CFG, None)
        assert state.get_reg_state(3) == RegState.ACCUMULATED
        assert state.read_reg_limbs_extended(3, 20, 30) == [300, 0]
        result = normalize_register(state, 3, 20, 30)
        assert result.normalized == (300, 0)
        assert result.carries == (0, 0)

    def test_add_with_carry(self):
        state = VMState(0)
        max_norm = (1 << 20) - 10
        state.write_reg_from_limbs(1, [max_norm, 0], 20)
        state.write_reg_from_limbs(2, [20, 0], 20)
        execute_add_deferred(state, 3, 1, 2, CFG, None)
        limbs = state.read_reg_limbs_extended(3, 20, 30)
        assert limbs[0] == (1 << 20) + 10
        result = normalize_register(state, 3, 20, 30)
        assert result.normalized == (10, 1)
        assert result.carries[0] == 1

    def test_sub(self):
        state = VMState(0)
        state.write_reg_from_limbs(1, [500, 0], 20)
        state.write_reg_from_limbs(2, [200, 0], 20)
        execute_sub_deferred(state, 3, 1, 2, CFG, None)
        normalize_register(state, 3, 20, 30)
        assert state.read_reg(3) == 300

    def test_addi(self):
        state = VMState(0)
        state.write_reg_from_limbs(1, [1000, 0], 20)
        execute_addi_deferred(state, 2, 1, 234, CFG, None)
        normalize_register(state, 2, 20, 30)
        assert state.read_reg(2) == 1234

    def test_r0_unchanged(self):
        state = VMState(0)
        state.write_reg_from_limbs(1, [100, 0], 20)
        execute_add_deferred(state, 0, 1, 1, CFG, None)
        assert state.read_reg(0) == 0

    def test_accumulation_chain(self):
        # Repeated deferred adds accumulate without carry extraction until
        # normalization.
        state = VMState(0)
        state.write_reg_from_limbs(1, [(1 << 20) - 1, 0], 20)
        state.write_reg_from_limbs(2, [0, 0], 20)
        for _ in range(100):
            execute_add_deferred(state, 2, 2, 1, CFG, None)
        normalize_register(state, 2, 20, 30)
        assert state.read_reg(2) == 100 * ((1 << 20) - 1)

    def test_overflow_forces_source_normalization(self):
        state = VMState(0)
        # Put an accumulated value near the 30-bit limit.
        state.write_reg_from_accumulated(1, [(1 << 30) - 5, 0], 30)
        state.write_reg_from_accumulated(2, [100, 0], 30)
        execute_add_deferred(state, 3, 1, 2, CFG, None)
        # The overflow path normalizes sources first; the result must be
        # mathematically correct after normalization.
        normalize_register(state, 3, 20, 30)
        expected = (((1 << 30) - 5) + 100) & ((1 << 40) - 1)
        assert state.read_reg(3) == expected


class TestNormalization:
    def test_normalize_simple(self):
        # reference normalize.rs:279-296
        state = VMState(0)
        state.write_reg_from_accumulated(1, [1048676, 5], 30)
        result = normalize_register(state, 1, 20, 30)
        assert result.accumulated == (1048676, 5)
        assert result.normalized == (100, 6)  # carry 1 into limb 1
        assert result.carries == (1, 0)
        assert state.get_reg_state(1) == RegState.NORMALIZED

    def test_normalize_twos_complement_wrap(self):
        # reference normalize.rs:331-360: [1081328, 1048575] case — the
        # final carry out of limb 1 is dropped.
        state = VMState(0)
        state.write_reg_from_accumulated(1, [1081328, 1048575], 30)
        result = normalize_register(state, 1, 20, 30)
        carry0 = 1081328 >> 20
        assert result.carries[0] == carry0
        assert result.normalized[0] == 1081328 & 0xFFFFF
        limb1 = 1048575 + carry0
        assert result.normalized[1] == limb1 & 0xFFFFF
        # Packed value wraps mod 2^40
        expected = ((1081328 & 0xFFFFF) | ((limb1 & 0xFFFFF) << 20))
        assert state.read_reg(1) == expected

    def test_already_normalized_returns_none(self):
        state = VMState(0)
        state.write_reg_from_limbs(1, [5, 5], 20)
        assert normalize_register(state, 1, 20, 30) is None

    def test_would_overflow(self):
        assert would_overflow([1 << 30, 0], 30)
        assert not would_overflow([(1 << 30) - 1, 0], 30)

    def test_get_normalized_regs(self):
        # reference state.rs:374-407
        state = VMState(0)
        state.write_reg_from_accumulated(1, [100, 0], 30)
        normalized = state.get_normalized_regs(20, 30)
        assert normalized[1] == 100
        state.write_reg_from_accumulated(2, [1048660, 1048575], 30)
        normalized = state.get_normalized_regs(20, 30)
        value_60 = 1048660 | (1048575 << 30)
        assert normalized[2] == value_60 & ((1 << 40) - 1)


class TestDeferredIntegration:
    def test_add_then_branch_normalizes(self):
        # reference deferred_integration_test.rs:21-95: a deferred ADD
        # followed by BEQ must observe the normalized value.
        config = VMConfig(enable_deferred_model=True)
        result = run(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=100),
            I(Op.ADDI, rd=2, rs1=0, imm=100),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.ADDI, rd=4, rs1=0, imm=200),
            I(Op.BEQ, rs1=3, rs2=4, imm=8),   # taken iff normalization worked
            I(Op.EBREAK),                     # skipped
            I(Op.ADDI, rd=5, rs1=0, imm=1),
            I(Op.EBREAK),
        ]), [], config)
        # Branch taken: 4 pre-branch + branch + addi + ebreak = 7 cycles
        assert result.cycles == 7

    def test_witness_cycle_pc_stamping(self):
        # reference witness_collection_test.rs
        config = VMConfig(enable_deferred_model=True)
        result = run(Program.from_instructions([
            I(Op.ADDI, rd=1, rs1=0, imm=5),
            I(Op.ADDI, rd=2, rs1=0, imm=5),
            I(Op.ADD, rd=3, rs1=1, rs2=2),
            I(Op.BEQ, rs1=3, rs2=3, imm=4),
            I(Op.EBREAK),
        ]), [], config)
        events = result.normalization_witnesses
        assert events, "branch must emit observation-point witnesses"
        beq_events = [e for e in events if e.witness.pc == 0x100C]
        assert beq_events
        assert beq_events[0].witness.cycle == 3
        assert all(e.witness.verify() for e in events)

    def test_deferred_matches_plain_execution(self):
        # Differential: deferred model must produce identical outputs to
        # the plain model for an arithmetic-heavy program.
        instrs = [I(Op.ADDI, rd=1, rs1=0, imm=7)]
        for i in range(50):
            instrs.append(I(Op.ADD, rd=2, rs1=2, rs2=1))
            instrs.append(I(Op.ADDI, rd=1, rs1=1, imm=3))
            if i % 7 == 0:
                instrs.append(I(Op.SUB, rd=3, rs1=2, rs2=1))
        instrs += [
            I(Op.ADDI, rd=11, rs1=2, imm=0),
            I(Op.ADDI, rd=10, rs1=0, imm=2),  # WRITE r11
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=3, imm=0),
            I(Op.ECALL),
            I(Op.EBREAK),
        ]
        program = Program.from_instructions(instrs)
        plain = run(program, [])
        deferred = run(program, [], VMConfig(enable_deferred_model=True))
        assert plain.outputs == deferred.outputs
        assert plain.cycles == deferred.cycles
