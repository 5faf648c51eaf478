"""Differential tests: vectorized M31 ops vs the scalar oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkir_tpu.spec.field import M31_PRIME, m31_add as s_add, m31_inv as s_inv, \
    m31_mul as s_mul, m31_sub as s_sub
from zkir_tpu.ops import field_ops as f

RNG = np.random.default_rng(42)


def rand_field(n):
    return RNG.integers(0, M31_PRIME, size=n, dtype=np.uint32)


@pytest.fixture(scope="module")
def ab():
    a = rand_field(4096)
    b = rand_field(4096)
    # Include edge values.
    edges = np.array([0, 1, 2, M31_PRIME - 1, M31_PRIME - 2,
                      (1 << 30), (1 << 16) - 1, (1 << 16)], dtype=np.uint32)
    a[: len(edges)] = edges
    b[: len(edges)] = edges[::-1]
    return jnp.asarray(a), jnp.asarray(b)


class TestJnpOps:
    def test_add(self, ab):
        a, b = ab
        got = np.asarray(f.m31_add(a, b))
        want = [s_add(int(x), int(y)) for x, y in zip(np.asarray(a), np.asarray(b))]
        np.testing.assert_array_equal(got, want)

    def test_sub(self, ab):
        a, b = ab
        got = np.asarray(f.m31_sub(a, b))
        want = [s_sub(int(x), int(y)) for x, y in zip(np.asarray(a), np.asarray(b))]
        np.testing.assert_array_equal(got, want)

    def test_mul(self, ab):
        a, b = ab
        got = np.asarray(f.m31_mul(a, b))
        want = [s_mul(int(x), int(y)) for x, y in zip(np.asarray(a), np.asarray(b))]
        np.testing.assert_array_equal(got, want)

    def test_mul32_matches_mul(self, ab):
        a, b = ab
        np.testing.assert_array_equal(
            np.asarray(f.m31_mul32(a, b)), np.asarray(f.m31_mul(a, b))
        )

    def test_neg(self, ab):
        a, _ = ab
        got = np.asarray(f.m31_neg(a))
        s = np.asarray(f.m31_add(a, jnp.asarray(got)))
        np.testing.assert_array_equal(s, np.zeros_like(s))

    def test_inv(self):
        a = jnp.asarray(rand_field(512))
        a = jnp.where(a == 0, jnp.uint32(1), a)
        inv = f.m31_inv(a)
        prod = np.asarray(f.m31_mul(a, inv))
        np.testing.assert_array_equal(prod, np.ones_like(prod))

    def test_inv_matches_scalar(self):
        vals = [1, 2, 3, 12345, M31_PRIME - 1]
        a = jnp.asarray(np.array(vals, dtype=np.uint32))
        got = np.asarray(f.m31_inv(a))
        want = [s_inv(v) for v in vals]
        np.testing.assert_array_equal(got, want)

    def test_batch_inv(self):
        a = np.asarray(rand_field(256))
        a[7] = 0  # zero maps to zero
        aj = jnp.asarray(a)
        inv = np.asarray(f.m31_batch_inv(aj))
        assert inv[7] == 0
        nz = a != 0
        prod = np.asarray(f.m31_mul(jnp.asarray(a[nz]), jnp.asarray(inv[nz])))
        np.testing.assert_array_equal(prod, np.ones_like(prod))

    def test_pow(self):
        a = jnp.asarray(rand_field(64))
        got = np.asarray(f.m31_pow(a, 5))
        want = [pow(int(x), 5, M31_PRIME) for x in np.asarray(a)]
        np.testing.assert_array_equal(got, want)


class TestPallasKernels:
    """Pallas kernels in interpreter mode (CPU CI); compiled path exercised
    on TPU by bench.py."""

    def test_mul_pallas(self, ab):
        a, b = ab
        a2 = a.reshape(32, 128)
        b2 = b.reshape(32, 128)
        got = np.asarray(f.m31_mul_pallas(a2, b2, interpret=True)).ravel()
        want = np.asarray(f.m31_mul(a, b))
        np.testing.assert_array_equal(got, want)

    def test_add_pallas(self, ab):
        a, b = ab
        a2 = a.reshape(32, 128)
        b2 = b.reshape(32, 128)
        got = np.asarray(f.m31_add_pallas(a2, b2, interpret=True)).ravel()
        want = np.asarray(f.m31_add(a, b))
        np.testing.assert_array_equal(got, want)
