"""Batched Keccak-256 / BLAKE3 device kernels vs host oracles."""

import hashlib

from zkir_tpu.ops.blake3 import blake3_many
from zkir_tpu.ops.keccak import keccak256_many
from zkir_tpu.runtime.crypto import blake3_digest, keccak256_digest


class TestKeccakBatch:
    def test_vectors(self):
        msgs = [b"", b"abc", b"hello", b"x" * 135, b"x" * 136, b"x" * 137,
                b"y" * 300]
        got = keccak256_many(msgs)
        for msg, digest in zip(msgs, got):
            assert digest == keccak256_digest(msg), msg[:16]

    def test_known_answer(self):
        got = keccak256_many([b"abc"])[0]
        assert got.hex() == (
            "4e03657aea45a94fc7d47ba826c8d667"
            "c0d1e6e33a64a036ec44f58fa12d6c45")


class TestBlake3Batch:
    def test_vectors(self):
        def pat(n):
            return bytes(i % 251 for i in range(n))
        msgs = [b"", b"abc", pat(63), pat(64), pat(65), pat(1023),
                pat(1024), pat(1025), pat(3000)]
        got = blake3_many(msgs)
        for msg, digest in zip(msgs, got):
            assert digest == blake3_digest(msg), len(msg)

    def test_large_batch(self):
        msgs = [f"m{i}".encode() * (i % 7 + 1) for i in range(64)]
        got = blake3_many(msgs)
        for msg, digest in zip(msgs, got):
            assert digest == blake3_digest(msg)
