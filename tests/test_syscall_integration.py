"""Syscall integration parity tests.

Vector source: reference zkir-runtime/tests/syscall_integration.rs (48
tests) — tape sequencing, crypto syscalls end-to-end through programs,
bound side effects.
"""

import hashlib

import pytest

from zkir_tpu.runtime import HaltReason, VM, VMConfig, run
from zkir_tpu.runtime.crypto import blake3_digest, keccak256_digest
from zkir_tpu.spec import Instruction, Op, Program


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _store_bytes(data: bytes, base: int):
    instrs = []
    for i, byte in enumerate(data):
        instrs += [
            I(Op.ADDI, rd=1, rs1=0, imm=base + i),
            I(Op.ADDI, rd=2, rs1=0, imm=byte),
            I(Op.SB, rs1=1, rs2=2, imm=0),
        ]
    return instrs


def _crypto_call(num: int, in_ptr: int, in_len: int, out_ptr: int):
    return [
        I(Op.ADDI, rd=10, rs1=0, imm=num),
        I(Op.ADDI, rd=11, rs1=0, imm=in_ptr),
        I(Op.ADDI, rd=12, rs1=0, imm=in_len),
        I(Op.ADDI, rd=13, rs1=0, imm=out_ptr),
        I(Op.ECALL),
    ]


def _run_vm(instrs, inputs=()):
    vm = VM(Program.from_instructions(instrs), list(inputs), VMConfig())
    return vm, vm.run()


class TestTapes:
    def test_interleaved_read_write(self):
        instrs = []
        for _ in range(3):
            instrs += [
                I(Op.ADDI, rd=10, rs1=0, imm=1),
                I(Op.ECALL),
                I(Op.ADDI, rd=11, rs1=10, imm=1),  # echo input + 1
                I(Op.ADDI, rd=10, rs1=0, imm=2),
                I(Op.ECALL),
            ]
        instrs.append(I(Op.EBREAK))
        _, result = _run_vm(instrs, [10, 20, 30])
        assert result.outputs == [11, 21, 31]

    def test_exit_code_from_r11(self):
        _, result = _run_vm([
            I(Op.ADDI, rd=11, rs1=0, imm=77),
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ECALL),
        ])
        assert result.halt_reason.reason == HaltReason.EXIT
        assert result.halt_reason.code == 77

    def test_exit_stops_execution(self):
        _, result = _run_vm([
            I(Op.ADDI, rd=10, rs1=0, imm=0),
            I(Op.ECALL),
            I(Op.ADDI, rd=11, rs1=0, imm=99),  # unreachable
            I(Op.ADDI, rd=10, rs1=0, imm=2),
            I(Op.ECALL),
        ])
        assert result.outputs == []
        assert result.cycles == 2


class TestCryptoSyscalls:
    def test_sha256_r14_bound_side_effect(self):
        vm, result = _run_vm(
            _crypto_call(3, 0x3000, 0, 0x4000) + [I(Op.EBREAK)])
        assert vm.state.bounds[14].max_bits == 32
        digest = bytes(vm.memory._peek(0x4000 + i) for i in range(32))
        # Output is 8 BE u32 words (crypto.rs:291-294).
        words = [int.from_bytes(digest[4 * i: 4 * i + 4], "little")
                 for i in range(8)]
        expected = hashlib.sha256(b"").digest()
        expected_words = [
            int.from_bytes(expected[4 * i: 4 * i + 4], "big")
            for i in range(8)
        ]
        # Each u32 was written LE into memory; value equals the BE word.
        assert words == expected_words

    def test_keccak_output_bytes(self):
        vm, _ = _run_vm(
            _store_bytes(b"abc", 0x3000)
            + _crypto_call(5, 0x3000, 3, 0x4000) + [I(Op.EBREAK)])
        out = bytes(vm.memory._peek(0x4000 + i) for i in range(32))
        assert out == keccak256_digest(b"abc")

    def test_blake3_output_bytes(self):
        vm, _ = _run_vm(
            _store_bytes(b"xyz", 0x3000)
            + _crypto_call(6, 0x3000, 3, 0x4000) + [I(Op.EBREAK)])
        out = bytes(vm.memory._peek(0x4000 + i) for i in range(32))
        assert out == blake3_digest(b"xyz")

    def test_poseidon2_end_to_end(self):
        from zkir_tpu.ops.poseidon2_ref import poseidon2_sponge_hash_bytes
        vm, _ = _run_vm(
            _store_bytes(b"data", 0x3000)
            + _crypto_call(4, 0x3000, 4, 0x4000) + [I(Op.EBREAK)])
        words = [
            int.from_bytes(
                bytes(vm.memory._peek(0x4000 + 4 * i + j) for j in range(4)),
                "little")
            for i in range(8)
        ]
        assert words == poseidon2_sponge_hash_bytes(b"data")

    def test_crypto_success_returns_zero_in_r10(self):
        for num in (3, 4, 5, 6):
            vm, _ = _run_vm(
                _crypto_call(num, 0x3000, 0, 0x4000) + [I(Op.EBREAK)])
            assert vm.state.regs[10] == 0, num

    def test_hash_then_rehash_chained(self):
        # SHA-256 digests are written as big-endian u32 words through the
        # little-endian write_u32 (reference crypto.rs:252-254 + memory LE
        # layout), so each 4-byte group lands byte-swapped in memory.  A
        # chained hash therefore consumes the swapped form.
        def swap4(data: bytes) -> bytes:
            return b"".join(data[i:i + 4][::-1] for i in range(0, 32, 4))

        vm, _ = _run_vm(
            _crypto_call(3, 0x3000, 0, 0x4000)
            + _crypto_call(3, 0x4000, 32, 0x5000)
            + [I(Op.EBREAK)])
        out = bytes(vm.memory._peek(0x5000 + i) for i in range(32))
        inner_mem = swap4(hashlib.sha256(b"").digest())
        assert out == swap4(hashlib.sha256(inner_mem).digest())
