"""QM31 extension-field axioms (scalar and vectorized agree)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkir_tpu.ops.qm31 import (
    QM31_ONE, QM31_ZERO, qm31_add, qm31_add_scalar, qm31_batch_inv,
    qm31_from_np, qm31_inv_scalar, qm31_mul, qm31_mul_cm31,
    qm31_mul_cm31_scalar, qm31_mul_scalar, qm31_pow_scalar, qm31_sub,
    qm31_sub_scalar, qm31_to_np)
from zkir_tpu.spec.field import M31_PRIME

P = M31_PRIME
RNG = np.random.default_rng(7)


def _rand():
    return tuple(int(x) for x in RNG.integers(0, P, 4))


class TestScalar:
    def test_field_axioms(self):
        for _ in range(20):
            x, y, z = _rand(), _rand(), _rand()
            assert qm31_mul_scalar(x, y) == qm31_mul_scalar(y, x)
            assert qm31_mul_scalar(x, qm31_mul_scalar(y, z)) == \
                qm31_mul_scalar(qm31_mul_scalar(x, y), z)
            lhs = qm31_mul_scalar(x, qm31_add_scalar(y, z))
            rhs = qm31_add_scalar(qm31_mul_scalar(x, y),
                                  qm31_mul_scalar(x, z))
            assert lhs == rhs
            assert qm31_mul_scalar(x, QM31_ONE) == x
            assert qm31_add_scalar(x, QM31_ZERO) == x

    def test_inverse(self):
        for _ in range(20):
            x = _rand()
            if x == QM31_ZERO:
                continue
            assert qm31_mul_scalar(x, qm31_inv_scalar(x)) == QM31_ONE

    def test_multiplicative_order(self):
        # |QM31*| = p^4 - 1; a random element to that power is 1.
        x = _rand()
        assert qm31_pow_scalar(x, P ** 4 - 1) == QM31_ONE

    def test_nontrivial_extension(self):
        # u^2 = 2 + i: (0,0,1,0)^2 must be (2,1,0,0).
        u = (0, 0, 1, 0)
        assert qm31_mul_scalar(u, u) == (2, 1, 0, 0)

    def test_sub(self):
        x, y = _rand(), _rand()
        assert qm31_add_scalar(qm31_sub_scalar(x, y), y) == x

    def test_mul_cm31(self):
        x = _rand()
        c = (int(RNG.integers(0, P)), int(RNG.integers(0, P)))
        assert qm31_mul_cm31_scalar(x, c) == \
            qm31_mul_scalar(x, (c[0], c[1], 0, 0))


class TestVectorized:
    def test_matches_scalar(self):
        n = 64
        xs = RNG.integers(0, P, (4, n), dtype=np.uint32)
        ys = RNG.integers(0, P, (4, n), dtype=np.uint32)
        xv = qm31_from_np(xs)
        yv = qm31_from_np(ys)
        for op_v, op_s in ((qm31_mul, qm31_mul_scalar),
                           (qm31_add, qm31_add_scalar),
                           (qm31_sub, qm31_sub_scalar)):
            out = qm31_to_np(op_v(xv, yv))
            for j in range(n):
                want = op_s(tuple(int(c[j]) for c in xs),
                            tuple(int(c[j]) for c in ys))
                assert tuple(int(out[k, j]) for k in range(4)) == want

    def test_batch_inv(self):
        n = 64
        xs = RNG.integers(0, P, (4, n), dtype=np.uint32)
        xs[:, 0] = 0  # zero maps to zero
        inv = qm31_to_np(qm31_batch_inv(qm31_from_np(xs)))
        assert tuple(inv[:, 0]) == (0, 0, 0, 0)
        for j in range(1, n):
            x = tuple(int(c[j]) for c in xs)
            got = tuple(int(inv[k, j]) for k in range(4))
            assert qm31_mul_scalar(x, got) == QM31_ONE

    def test_mul_cm31_vec(self):
        n = 32
        xs = RNG.integers(0, P, (4, n), dtype=np.uint32)
        cs = RNG.integers(0, P, (2, n), dtype=np.uint32)
        out = qm31_to_np(qm31_mul_cm31(
            qm31_from_np(xs), (jnp.asarray(cs[0]), jnp.asarray(cs[1]))))
        for j in range(n):
            want = qm31_mul_scalar(
                tuple(int(c[j]) for c in xs),
                (int(cs[0, j]), int(cs[1, j]), 0, 0))
            assert tuple(int(out[k, j]) for k in range(4)) == want


def test_challenger_sample_qm31():
    from zkir_tpu.prover.challenger import Challenger

    a, b = Challenger(), Challenger()
    a.observe(5)
    b.observe(5)
    x = a.sample_qm31()
    assert len(x) == 4 and all(0 <= v < P for v in x)
    assert x == b.sample_qm31()
