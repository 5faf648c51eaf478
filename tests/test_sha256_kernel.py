"""Batched SHA-256 kernel vs hashlib."""

import hashlib

import numpy as np
import pytest

import jax.numpy as jnp

from zkir_tpu.ops.sha256 import (
    Sha256Stream,
    digests_to_bytes,
    sha256_compress_batch_with_witness,
    sha256_many,
)


class TestSha256Batch:
    def test_known_vectors(self):
        messages = [b"", b"abc", b"hello", b"a" * 55, b"a" * 56, b"a" * 64,
                    b"a" * 200, bytes(range(256)) * 5]
        digests = digests_to_bytes(sha256_many(messages))
        for msg, digest in zip(messages, digests):
            assert digest == hashlib.sha256(msg).digest(), msg[:16]

    def test_large_batch(self):
        messages = [f"message-{i}".encode() for i in range(512)]
        digests = digests_to_bytes(sha256_many(messages))
        for msg, digest in zip(messages, digests):
            assert digest == hashlib.sha256(msg).digest()

    def test_witness_shape_and_final_state(self):
        from zkir_tpu.runtime.crypto import SHA256_H0, sha256_pad
        msg = b"abc"
        padded = sha256_pad(msg)
        blocks = jnp.asarray(
            np.frombuffer(padded, dtype=">u4").reshape(1, 16)
            .astype(np.uint32))
        states = jnp.asarray(np.asarray([SHA256_H0], dtype=np.uint32))
        final, witness = sha256_compress_batch_with_witness(blocks, states)
        assert witness.shape == (1, 64, 8)
        digest = b"".join(int(w).to_bytes(4, "big")
                          for w in np.asarray(final)[0])
        assert digest == hashlib.sha256(msg).digest()
        # Witness rounds must match the scalar oracle's round states.
        from zkir_tpu.runtime.crypto import Sha256Witness, sha256_compress
        oracle_wit = Sha256Witness()
        block_words = [int(w) for w in np.asarray(blocks)[0]]
        sha256_compress(block_words, list(SHA256_H0), oracle_wit)
        got = np.asarray(witness)[0]
        for r in range(64):
            assert [int(x) for x in got[r]] == oracle_wit.round_states[r], r


class TestSha256Stream:
    def test_streaming_matches_one_shot(self):
        streams = Sha256Stream(3)
        parts = [
            [b"hello ", b"world", b"!" * 100],
            [b"", b"abc", b""],
            [b"x" * 64, b"y" * 64, b"z" * 7],
        ]
        for i in range(3):
            streams.update([parts[0][i], parts[1][i], parts[2][i]])
        digests = streams.finalize()
        for lane in range(3):
            full = b"".join(parts[lane][i] for i in range(3))
            assert digests[lane] == hashlib.sha256(full).digest()
