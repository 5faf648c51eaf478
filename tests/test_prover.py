"""Merkle, FRI, and end-to-end trace-proof tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.ops import merkle
from zkir_tpu.ops.ntt import lde, ntt
from zkir_tpu.prover.trace import N_COLUMNS
from zkir_tpu.prover import Challenger, fri_prove, fri_verify, prove_trace, \
    trace_to_matrix, verify_trace
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program
from zkir_tpu.spec.field import M31_PRIME

RNG = np.random.default_rng(123)


class TestMerkle:
    def test_tree_and_paths(self):
        leaves_data = RNG.integers(0, M31_PRIME, size=(16, 10),
                                   dtype=np.uint32)
        leaves = merkle.hash_rows(jnp.asarray(leaves_data))
        levels = merkle.build_tree(leaves)
        root = merkle.root(levels)
        assert root.shape == (8,)
        for idx in (0, 5, 15):
            path = merkle.open_path(levels, idx)
            assert len(path) == 4
            assert merkle.verify_path(root, idx, np.asarray(leaves[idx]), path)

    def test_bad_path_rejected(self):
        leaves_data = RNG.integers(0, M31_PRIME, size=(8, 4), dtype=np.uint32)
        leaves = merkle.hash_rows(jnp.asarray(leaves_data))
        levels = merkle.build_tree(leaves)
        root = merkle.root(levels)
        path = merkle.open_path(levels, 3)
        bad = [p.copy() for p in path]
        bad[1][0] = (bad[1][0] + 1) % M31_PRIME
        assert not merkle.verify_path(root, 3, np.asarray(leaves[3]), bad)
        # Wrong leaf
        assert not merkle.verify_path(root, 3, np.asarray(leaves[4]), path)

    def test_hash_rows_deterministic_and_width_sensitive(self):
        m1 = jnp.asarray(np.asarray([[1, 2, 3]], dtype=np.uint32))
        m2 = jnp.asarray(np.asarray([[1, 2, 3, 0]], dtype=np.uint32))
        h1 = np.asarray(merkle.hash_rows(m1))
        h2 = np.asarray(merkle.hash_rows(m2))
        assert not np.array_equal(h1, h2)  # 1||0* padding separates widths


class TestChallenger:
    def test_deterministic(self):
        a, b = Challenger(), Challenger()
        a.observe_many([1, 2, 3])
        b.observe_many([1, 2, 3])
        assert a.sample() == b.sample()
        assert a.sample_cm31() == b.sample_cm31()
        assert a.sample_bits(10) == b.sample_bits(10)

    def test_observation_changes_samples(self):
        a, b = Challenger(), Challenger()
        a.observe(1)
        b.observe(2)
        assert a.sample() != b.sample()


def _low_degree_evals(log_n, log_blowup, seed=0):
    """QM31 evaluations of a random degree < 2^(log_n - log_blowup)
    polynomial (two independent CM31 coordinate polynomials)."""
    rng = np.random.default_rng(seed)
    n = 1 << log_n
    deg = 1 << (log_n - log_blowup)
    out = []
    for _ in range(2):
        coeffs_r = np.zeros(n, dtype=np.uint32)
        coeffs_i = np.zeros(n, dtype=np.uint32)
        coeffs_r[:deg] = rng.integers(0, M31_PRIME, deg, dtype=np.uint32)
        coeffs_i[:deg] = rng.integers(0, M31_PRIME, deg, dtype=np.uint32)
        out += list(ntt(jnp.asarray(coeffs_r), jnp.asarray(coeffs_i), log_n))
    return tuple(out)


class TestFri:
    CFG = FriConfig(log_blowup=2, log_final=3, num_queries=8, grinding_bits=2, min_security=0)

    def test_accepts_low_degree(self):
        log_n = 8
        vals = _low_degree_evals(log_n, self.CFG.log_blowup)
        proof = fri_prove(vals, log_n, Challenger(), self.CFG)
        assert fri_verify(proof, Challenger())

    def test_rejects_high_degree(self):
        log_n = 8
        rng = np.random.default_rng(9)
        vals = tuple(
            jnp.asarray(rng.integers(0, M31_PRIME, 1 << log_n,
                                     dtype=np.uint32))
            for _ in range(4))
        proof = fri_prove(vals, log_n, Challenger(), self.CFG)
        assert not fri_verify(proof, Challenger())

    def test_rejects_tampered_value(self):
        log_n = 8
        vals = _low_degree_evals(log_n, self.CFG.log_blowup)
        proof = fri_prove(vals, log_n, Challenger(), self.CFG)
        lo = proof["queries"][0][0]["lo"]
        proof["queries"][0][0]["lo"] = ((lo[0] + 1) % M31_PRIME,) + tuple(lo[1:])
        assert not fri_verify(proof, Challenger())

    def test_rejects_tampered_final(self):
        log_n = 8
        vals = _low_degree_evals(log_n, self.CFG.log_blowup)
        proof = fri_prove(vals, log_n, Challenger(), self.CFG)
        proof["final"][0][0] = (proof["final"][0][0] + 1) % M31_PRIME
        assert not fri_verify(proof, Challenger())


class TestTraceProof:
    CFG = FriConfig(log_blowup=2, log_final=3, num_queries=6, grinding_bits=2, min_security=0)

    def _trace_matrix(self):
        program = Program.from_instructions([
            Instruction(Op.ADDI, rd=1, rs1=0, imm=3),
            Instruction(Op.ADDI, rd=2, rs1=0, imm=5),
            Instruction(Op.ADD, rd=3, rs1=1, rs2=2),
            Instruction(Op.MUL, rd=4, rs1=3, rs2=2),
            Instruction(Op.SW, rs1=0, rs2=4, imm=0x2000),
            Instruction(Op.EBREAK),
        ])
        interp = TpuInterpreter(program, InterpConfig(
            lanes=1, chunk=16, collect_trace=True))
        result = interp.run([[]])
        return trace_to_matrix(result["trace"])

    def test_trace_matrix_shape(self):
        matrix = self._trace_matrix()
        assert matrix.shape == (6, N_COLUMNS)
        assert (matrix < M31_PRIME).all()
        # pc limbs reconstruct the program counter
        assert matrix[0, 0] == 0x1000
        assert matrix[2, 2] == Op.ADD

    def test_prove_verify_roundtrip(self):
        matrix = self._trace_matrix()
        proof = prove_trace(matrix, self.CFG)
        assert verify_trace(proof)

    def test_tampered_root_rejected(self):
        matrix = self._trace_matrix()
        proof = prove_trace(matrix, self.CFG)
        proof["trace_root"][0] = (proof["trace_root"][0] + 1) % M31_PRIME
        assert not verify_trace(proof)

    def test_tampered_opening_rejected(self):
        matrix = self._trace_matrix()
        proof = prove_trace(matrix, self.CFG)
        key = next(iter(proof["openings"][0]["trace"]))
        entry = proof["openings"][0]["trace"][key]
        entry["row"][0] = (entry["row"][0] + 1) % M31_PRIME
        assert not verify_trace(proof)

    def test_constraint_violation_rejected(self):
        # Corrupt the pc chain: a sequential row whose successor pc is
        # wrong violates the AIR transition constraint, making the
        # "quotient" a non-polynomial — FRI + the point checks reject it.
        matrix = self._trace_matrix()
        matrix[1, 0] = (matrix[1, 0] + 8) % M31_PRIME  # pc_lo of row 1
        proof = prove_trace(matrix, self.CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_r0_violation_rejected(self):
        matrix = self._trace_matrix()
        matrix[2, 8] = 5  # r0 limb0 must be 0
        proof = prove_trace(matrix, self.CFG, selfcheck=False)
        assert not verify_trace(proof)

    def test_selfcheck_names_violated_constraint_at_prove_time(self):
        # The completeness self-check (on by default) must refuse to
        # ship a proof of a constraint-violating trace, naming the
        # violated term and row instead of failing only at verify.
        from zkir_tpu.prover.prover import ConstraintViolation

        matrix = self._trace_matrix()
        matrix[1, 0] = (matrix[1, 0] + 8) % M31_PRIME  # pc chain break
        with pytest.raises(ConstraintViolation) as exc:
            prove_trace(matrix, self.CFG)
        msg = str(exc.value)
        assert "term #" in msg and "rows" in msg

    def test_selfcheck_names_row_zero_violation(self):
        from zkir_tpu.prover.prover import ConstraintViolation

        matrix = self._trace_matrix()
        matrix[2, 8] = 5  # r0 limb0 must be 0 (a Z_H single, row 2)
        with pytest.raises(ConstraintViolation) as exc:
            prove_trace(matrix, self.CFG)
        assert "rows [2]" in str(exc.value)
