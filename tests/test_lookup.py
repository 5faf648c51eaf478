"""LogUp range-lookup argument tests."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover.lookup import (
    chunk_multiplicities,
    logup_sum,
    partial_sums,
    prove_range_lookup,
    table_sum,
    verify_range_lookup,
)
from zkir_tpu.spec import Instruction, Op, Program
from zkir_tpu.spec.field import M31_PRIME

RNG = np.random.default_rng(31)


class TestSums:
    def test_identity_holds_for_valid_chunks(self):
        chunks = RNG.integers(0, 1024, size=500, dtype=np.uint32)
        m = chunk_multiplicities(chunks, 1024)
        beta = (123456789, 987654321)
        assert logup_sum(chunks, beta) == table_sum(m, beta)

    def test_identity_fails_for_wrong_multiplicities(self):
        chunks = RNG.integers(0, 1024, size=100, dtype=np.uint32)
        m = chunk_multiplicities(chunks, 1024).copy()
        m[7] += 1
        beta = (55555, 7777)
        assert logup_sum(chunks, beta) != table_sum(m, beta)

    def test_partial_sums_telescope_to_zero(self):
        chunks = RNG.integers(0, 64, size=200, dtype=np.uint32)
        m = chunk_multiplicities(chunks, 64)
        beta = (424242, 111)
        s = partial_sums(chunks, m, beta)
        assert tuple(s[0]) == (0, 0)
        assert tuple(s[-1]) == (0, 0)

    def test_sum_linear_in_duplicates(self):
        # {5, 5} vs multiplicity 2 at value 5.
        beta = (999983, 31337)
        chunks = np.asarray([5, 5], dtype=np.uint32)
        m = np.zeros(16, dtype=np.uint32)
        m[5] = 2
        assert logup_sum(chunks, beta) == table_sum(m, beta)


class TestProveVerify:
    def test_roundtrip(self):
        chunks = RNG.integers(0, 1024, size=333, dtype=np.uint32)
        proof = prove_range_lookup(chunks)
        assert verify_range_lookup(proof, chunks)

    def test_out_of_range_rejected(self):
        chunks = RNG.integers(0, 1024, size=50, dtype=np.uint32)
        chunks[13] = 1024  # outside the 10-bit table
        proof = prove_range_lookup(chunks)
        assert not verify_range_lookup(proof, chunks)

    def test_tampered_sum_rejected(self):
        chunks = RNG.integers(0, 1024, size=50, dtype=np.uint32)
        proof = prove_range_lookup(chunks)
        proof["witness_sum"] = ((proof["witness_sum"][0] + 1) % M31_PRIME,
                                proof["witness_sum"][1])
        assert not verify_range_lookup(proof, chunks)

    def test_device_rc_chunks_feed_lookup(self):
        # End to end: interpreter range-check chunk columns -> lookup proof.
        instrs = [Instruction(Op.ADDI, rd=1, rs1=0, imm=(1 << 15) - 1)]
        instrs += [Instruction(Op.ADD, rd=1, rs1=1, rs2=1)] * 30
        instrs += [Instruction(Op.EBREAK)]
        interp = TpuInterpreter(Program.from_instructions(instrs),
                                InterpConfig(lanes=1, chunk=64,
                                             collect_trace=True))
        result = interp.run([[]])
        trace = result["trace"]
        idx = np.nonzero(trace["rc_valid"][:, 0])[0]
        chunks = np.asarray(trace["rc_chunks"][idx, 0]).astype(np.uint32)
        assert chunks.size > 0
        proof = prove_range_lookup(chunks)
        assert verify_range_lookup(proof, chunks)
