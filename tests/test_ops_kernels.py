"""Tests for batched Poseidon2 and CM31 NTT kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkir_tpu.ops import ntt as nttmod
from zkir_tpu.ops.poseidon2 import (
    poseidon2_compress_batch,
    poseidon2_permute_batch,
    poseidon2_permute_pallas,
    poseidon2_sponge_batch,
)
from zkir_tpu.ops.poseidon2_ref import (
    RATE,
    WIDTH,
    poseidon2_compress,
    poseidon2_permute,
    poseidon2_sponge,
)
from zkir_tpu.spec.field import M31_PRIME

RNG = np.random.default_rng(7)


def rand_states(n):
    return RNG.integers(0, M31_PRIME, size=(n, WIDTH), dtype=np.uint32)


class TestPoseidon2Batch:
    def test_matches_scalar_reference(self):
        states = rand_states(16)
        got = np.asarray(poseidon2_permute_batch(jnp.asarray(states)))
        for i in range(len(states)):
            want = poseidon2_permute([int(x) for x in states[i]])
            assert [int(x) for x in got[i]] == want, i

    def test_compress_matches_scalar(self):
        left = RNG.integers(0, M31_PRIME, size=(8, RATE), dtype=np.uint32)
        right = RNG.integers(0, M31_PRIME, size=(8, RATE), dtype=np.uint32)
        got = np.asarray(poseidon2_compress_batch(
            jnp.asarray(left), jnp.asarray(right)))
        for i in range(8):
            want = poseidon2_compress([int(x) for x in left[i]],
                                      [int(x) for x in right[i]])
            assert [int(x) for x in got[i]] == want

    def test_sponge_matches_scalar(self):
        # 2 blocks of rate 8, pre-padded exactly as poseidon2_sponge does.
        elements = [int(x) for x in
                    RNG.integers(0, M31_PRIME, size=11, dtype=np.uint32)]
        padded = list(elements) + [1]
        while len(padded) % RATE != 0:
            padded.append(0)
        blocks = np.asarray(padded, dtype=np.uint32).reshape(1, -1, RATE)
        got = np.asarray(poseidon2_sponge_batch(jnp.asarray(blocks)))[0]
        want = poseidon2_sponge(elements)
        assert [int(x) for x in got] == want

    def test_pallas_kernel_matches(self):
        states = rand_states(8)
        got = np.asarray(poseidon2_permute_pallas(
            jnp.asarray(states), interpret=True))
        want = np.asarray(poseidon2_permute_batch(jnp.asarray(states)))
        np.testing.assert_array_equal(got, want)


class TestCM31:
    def test_i_squared_is_minus_one(self):
        out = nttmod.cm31_mul_scalar((0, 1), (0, 1))
        assert out == (M31_PRIME - 1, 0)

    def test_generator_order(self):
        g = nttmod._find_generator()
        order = M31_PRIME * M31_PRIME - 1
        assert nttmod.cm31_pow_scalar(g, order) == (1, 0)
        for q in [2, 3, 7, 11, 31, 151, 331]:
            assert nttmod.cm31_pow_scalar(g, order // q) != (1, 0)

    def test_root_of_unity_orders(self):
        for log_n in (1, 2, 8, 16):
            w = nttmod.root_of_unity(log_n)
            assert nttmod.cm31_pow_scalar(w, 1 << log_n) == (1, 0)
            assert nttmod.cm31_pow_scalar(w, 1 << (log_n - 1)) != (1, 0)

    def test_half_order_root_is_minus_one(self):
        w = nttmod.root_of_unity(10)
        assert nttmod.cm31_pow_scalar(w, 1 << 9) == (M31_PRIME - 1, 0)

    def test_inv_scalar(self):
        a = (12345, 6789)
        inv = nttmod.cm31_inv_scalar(a)
        assert nttmod.cm31_mul_scalar(a, inv) == (1, 0)


class TestNTT:
    def _naive_eval(self, coeffs, log_n):
        """Evaluate the polynomial at all domain points (slow oracle)."""
        n = 1 << log_n
        w = nttmod.root_of_unity(log_n)
        out = []
        for j in range(n):
            x = nttmod.cm31_pow_scalar(w, j)
            acc = (0, 0)
            xp = (1, 0)
            for c in coeffs:
                acc = ((acc[0] + c[0] * xp[0] - c[1] * xp[1]) % M31_PRIME,
                       (acc[1] + c[0] * xp[1] + c[1] * xp[0]) % M31_PRIME)
                xp = nttmod.cm31_mul_scalar(xp, x)
            out.append(acc)
        return out

    def test_ntt_matches_naive(self):
        log_n = 4
        n = 1 << log_n
        coeffs = [(int(RNG.integers(M31_PRIME)), int(RNG.integers(M31_PRIME)))
                  for _ in range(n)]
        want = self._naive_eval(coeffs, log_n)
        re = jnp.asarray(np.array([c[0] for c in coeffs], dtype=np.uint32))
        im = jnp.asarray(np.array([c[1] for c in coeffs], dtype=np.uint32))
        out_r, out_i = nttmod.ntt(re, im, log_n)
        got = list(zip([int(x) for x in np.asarray(out_r)],
                       [int(x) for x in np.asarray(out_i)]))
        assert got == want

    def test_roundtrip(self):
        log_n = 10
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        im = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        er, ei = nttmod.ntt(re, im, log_n)
        rr, ri = nttmod.intt(er, ei, log_n)
        np.testing.assert_array_equal(np.asarray(rr), np.asarray(re))
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(im))

    def test_batched(self):
        log_n = 6
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, (5, n), dtype=np.uint32))
        im = jnp.zeros((5, n), dtype=jnp.uint32)
        er, ei = nttmod.ntt(re, im, log_n)
        rr, _ = nttmod.intt(er, ei, log_n)
        np.testing.assert_array_equal(np.asarray(rr), np.asarray(re))

    def test_polynomial_multiplication(self):
        # Convolution theorem check over the base field embed.
        log_n = 5
        n = 1 << log_n
        a = np.zeros(n, dtype=np.uint32)
        b = np.zeros(n, dtype=np.uint32)
        a[:4] = [1, 2, 3, 4]
        b[:3] = [5, 6, 7]
        zero = jnp.zeros(n, dtype=jnp.uint32)
        ar, ai = nttmod.ntt(jnp.asarray(a), zero, log_n)
        br, bi = nttmod.ntt(jnp.asarray(b), zero, log_n)
        cr, ci = nttmod.cm31_mul((ar, ai), (br, bi))
        pr, pi = nttmod.intt(cr, ci, log_n)
        want = np.convolve([1, 2, 3, 4], [5, 6, 7])
        got = np.asarray(pr)[: len(want)]
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(np.asarray(pi), np.zeros(n))

    def test_lde_extends(self):
        # LDE evaluations at stride 2^blowup must reproduce the originals.
        log_n, log_blowup = 6, 2
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        im = jnp.zeros(n, dtype=jnp.uint32)
        big_r, big_i = nttmod.lde(re, im, log_n, log_blowup)
        np.testing.assert_array_equal(
            np.asarray(big_r)[:: 1 << log_blowup], np.asarray(re))
        np.testing.assert_array_equal(
            np.asarray(big_i)[:: 1 << log_blowup], np.asarray(im))


class TestNttLarge:
    @pytest.mark.parametrize("log_n", [6, 9, 12])
    def test_matches_ntt(self, log_n):
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        im = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        want = nttmod.ntt(re, im, log_n)
        got = nttmod.ntt_large(re, im, log_n)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
