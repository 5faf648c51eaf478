"""Radix-2 NTT over the CM31 complex extension of Mersenne-31.

M31 itself has 2-adicity 1 (p - 1 = 2 * 3^2 * 7 * 11 * 31 * 151 * 331), so
radix-2 FFTs are impossible in the base field.  The standard fix — used
throughout this framework's commitment pipeline — is the quadratic extension
CM31 = M31[i] with i^2 = -1 (valid since p = 3 mod 4): its multiplicative
group has order p^2 - 1 = (p - 1) * 2^31, giving a 2-adic subgroup of size
2^31.  Base-field polynomials embed with zero imaginary part; their
evaluations on the subgroup are CM31 values.

Layout: CM31 arrays are pairs ``(re, im)`` of uint32 arrays of canonical
M31 values.  The NTT itself is an iterative bit-reversal + Cooley-Tukey
butterfly network, fully vectorized — on TPU every stage is a pair of
elementwise VPU ops over the whole (batched) domain, and under sharding the
first log2(n_devices) stages become ``all_to_all`` exchanges (see
``zkir_tpu.parallel``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.field import M31_PRIME, m31_inv as s_inv
from .field_ops import m31_add, m31_mul, m31_sub

P = M31_PRIME

# ============================================================================
# Scalar CM31 helpers (host, Python ints) for twiddle generation
# ============================================================================


def _is_host_scalar(x) -> bool:
    return isinstance(x, (int, np.integer))


def cm31_mul_scalar(a: Tuple[int, int], b: Tuple[int, int]) -> Tuple[int, int]:
    """CM31 product of scalar pairs.  Polymorphic: exact Python-int math
    for host pairs; modular uint32 ops for traced 0-d values (so the same
    challenge algebra runs inside jitted prover kernels)."""
    ar, ai = a
    br, bi = b
    if all(_is_host_scalar(x) for x in (ar, ai, br, bi)):
        return ((ar * br - ai * bi) % P, (ar * bi + ai * br) % P)
    ar, ai, br, bi = (jnp.asarray(x, jnp.uint32) for x in (ar, ai, br, bi))
    return (m31_sub(m31_mul(ar, br), m31_mul(ai, bi)),
            m31_add(m31_mul(ar, bi), m31_mul(ai, br)))


def cm31_pow_scalar(a: Tuple[int, int], exp: int) -> Tuple[int, int]:
    result = (1, 0)
    base = a
    while exp > 0:
        if exp & 1:
            result = cm31_mul_scalar(result, base)
        base = cm31_mul_scalar(base, base)
        exp >>= 1
    return result


def cm31_inv_scalar(a: Tuple[int, int]) -> Tuple[int, int]:
    ar, ai = a
    norm = (ar * ar + ai * ai) % P
    ninv = s_inv(norm)
    return ((ar * ninv) % P, ((P - ai) * ninv) % P)


@functools.lru_cache(maxsize=1)
def _find_generator() -> Tuple[int, int]:
    """Element of CM31* of maximal order p^2 - 1.

    p^2 - 1 = 2^32 * 3^2 * 7 * 11 * 31 * 151 * 331."""
    order = P * P - 1
    prime_factors = [2, 3, 7, 11, 31, 151, 331]
    candidate = 2
    while True:
        for g in [(candidate, 1), (1, candidate), (candidate, candidate - 1)]:
            if all(
                cm31_pow_scalar(g, order // q) != (1, 0)
                for q in prime_factors
            ):
                return g
        candidate += 1


@functools.lru_cache(maxsize=None)
def root_of_unity(log_n: int) -> Tuple[int, int]:
    """Primitive 2^log_n-th root of unity in CM31 (log_n <= 31)."""
    assert 0 <= log_n <= 31
    g = _find_generator()
    order = P * P - 1
    return cm31_pow_scalar(g, order >> log_n)


@functools.lru_cache(maxsize=None)
def _twiddle_table(log_n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Powers w^0 .. w^(n-1) (numpy uint32 pair), built by doubling:
    log n vectorized steps instead of n scalar multiplications."""
    w = root_of_unity(log_n)
    if inverse:
        w = cm31_inv_scalar(w)
    re = np.ones(1, dtype=np.uint64)
    im = np.zeros(1, dtype=np.uint64)
    # Doubling construction: powers[0:2^k] known, append powers * w^(2^k).
    cur = w
    for _ in range(log_n):
        cr, ci = cur
        new_re = (re * cr + (P - im) * ci) % P  # re*cr - im*ci
        new_im = (re * ci + im * cr) % P
        re = np.concatenate([re, new_re])
        im = np.concatenate([im, new_im])
        cur = cm31_mul_scalar(cur, cur)
    return re.astype(np.uint32), im.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _bitrev(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


# ============================================================================
# Vectorized CM31 arithmetic (jnp)
# ============================================================================


def cm31_mul(a, b):
    ar, ai = a
    br, bi = b
    return (
        m31_sub(m31_mul(ar, br), m31_mul(ai, bi)),
        m31_add(m31_mul(ar, bi), m31_mul(ai, br)),
    )


def cm31_add(a, b):
    return (m31_add(a[0], b[0]), m31_add(a[1], b[1]))


def cm31_sub(a, b):
    return (m31_sub(a[0], b[0]), m31_sub(a[1], b[1]))


# ============================================================================
# NTT
# ============================================================================


# Above this size, route through the four-step factorization: with the
# flat butterfly layout the elementwise minor dimension is the (small)
# half-block size at early stages, starving the 128-lane axis; the
# four-step keeps a large free axis minor at every stage (~15x on 2^18).
_FOUR_STEP_MIN = 10


def _ntt_penult(re, im, log_n: int, inverse: bool):
    """Iterative NTT along axis -2 of [..., n, B]: every butterfly is
    elementwise over the minor B axis (kept large by the caller)."""
    n = 1 << log_n
    twr_np, twi_np = _twiddle_table(log_n, inverse)
    rev = _bitrev(log_n)
    re = re[..., rev, :]
    im = im[..., rev, :]
    batch = re.shape[:-2]
    b = re.shape[-1]

    m = 1
    for _ in range(log_n):
        m2 = m * 2
        stride = n // m2
        twr = jnp.asarray(twr_np[::stride][:m])[:, None]
        twi = jnp.asarray(twi_np[::stride][:m])[:, None]
        re_b = re.reshape(*batch, n // m2, 2, m, b)
        im_b = im.reshape(*batch, n // m2, 2, m, b)
        ur, ui = re_b[..., 0, :, :], im_b[..., 0, :, :]
        vr, vi = cm31_mul((re_b[..., 1, :, :], im_b[..., 1, :, :]),
                          (twr, twi))
        out_r = jnp.stack([m31_add(ur, vr), m31_sub(ur, vr)], axis=-3)
        out_i = jnp.stack([m31_add(ui, vi), m31_sub(ui, vi)], axis=-3)
        re = out_r.reshape(*batch, n, b)
        im = out_i.reshape(*batch, n, b)
        m = m2
    return re, im


def _ntt_core(re, im, log_n: int, inverse: bool):
    """NTT over the last axis (size 2^log_n), arbitrary leading batch."""
    if log_n >= _FOUR_STEP_MIN:
        # Four-step: n = n1 * n2, j = j1*n2 + j2, X[k1 + n1*k2].
        log_n1 = log_n // 2
        log_n2 = log_n - log_n1
        n1, n2 = 1 << log_n1, 1 << log_n2
        batch = re.shape[:-1]
        re2 = re.reshape(*batch, n1, n2)
        im2 = im.reshape(*batch, n1, n2)
        r, i = _ntt_penult(re2, im2, log_n1, inverse)  # over j1, minor n2
        twr, twi = _mid_twiddles(log_n1, log_n2, inverse)
        r, i = cm31_mul((r, i), (jnp.asarray(twr), jnp.asarray(twi)))
        r = jnp.swapaxes(r, -1, -2)  # [..., n2, n1]
        i = jnp.swapaxes(i, -1, -2)
        r, i = _ntt_penult(r, i, log_n2, inverse)  # over j2, minor n1
        # Layout [..., k2, k1]; flat index k2*n1 + k1 == natural order.
        return r.reshape(*batch, 1 << log_n), i.reshape(*batch, 1 << log_n)

    n = 1 << log_n
    twr_np, twi_np = _twiddle_table(log_n, inverse)
    rev = _bitrev(log_n)
    re = re[..., rev]
    im = im[..., rev]
    batch = re.shape[:-1]

    m = 1
    for _ in range(log_n):
        m2 = m * 2
        stride = n // m2
        twr = jnp.asarray(twr_np[::stride][:m])
        twi = jnp.asarray(twi_np[::stride][:m])
        re_b = re.reshape(*batch, n // m2, 2, m)
        im_b = im.reshape(*batch, n // m2, 2, m)
        ur, ui = re_b[..., 0, :], im_b[..., 0, :]
        vr, vi = cm31_mul((re_b[..., 1, :], im_b[..., 1, :]), (twr, twi))
        out_r = jnp.stack([m31_add(ur, vr), m31_sub(ur, vr)], axis=-2)
        out_i = jnp.stack([m31_add(ui, vi), m31_sub(ui, vi)], axis=-2)
        re = out_r.reshape(*batch, n)
        im = out_i.reshape(*batch, n)
        m = m2
    return re, im


@functools.lru_cache(maxsize=None)
def _mid_twiddles(log_n1: int, log_n2: int, inverse: bool):
    """Four-step mid twiddles T[k1, j2] = w^(±k1*j2)."""
    log_n = log_n1 + log_n2
    n = 1 << log_n
    twr, twi = _twiddle_table(log_n, inverse)
    k1 = np.arange(1 << log_n1, dtype=np.int64)[:, None]
    j2 = np.arange(1 << log_n2, dtype=np.int64)[None, :]
    idx = (k1 * j2) % n
    return twr[idx], twi[idx]


@functools.partial(jax.jit, static_argnames=("log_n",))
def ntt(re, im, log_n: int):
    """Forward NTT (coefficients -> evaluations on the 2^log_n subgroup)."""
    return _ntt_core(re, im, log_n, inverse=False)


@functools.partial(jax.jit, static_argnames=("log_n",))
def ntt_large(re, im, log_n: int):
    """Four-step forward NTT (``ntt`` already routes large sizes through
    the four-step factorization; kept as an explicit entry point)."""
    return _ntt_core(re, im, log_n, inverse=False)


@functools.partial(jax.jit, static_argnames=("log_n",))
def intt(re, im, log_n: int):
    """Inverse NTT (evaluations -> coefficients)."""
    out_r, out_i = _ntt_core(re, im, log_n, inverse=True)
    n_inv = jnp.uint32(s_inv(1 << log_n))
    return m31_mul(out_r, n_inv), m31_mul(out_i, n_inv)


@functools.lru_cache(maxsize=None)
def _shift_powers(shift: Tuple[int, int], log_n: int):
    """(shift^0 .. shift^(n-1)) as numpy uint32 pairs, by doubling."""
    re = np.ones(1, dtype=np.uint64)
    im = np.zeros(1, dtype=np.uint64)
    cur = shift
    for _ in range(log_n):
        cr, ci = cur
        new_re = (re * cr + (P - im) * ci) % P
        new_im = (re * ci + im * cr) % P
        re = np.concatenate([re, new_re])
        im = np.concatenate([im, new_im])
        cur = cm31_mul_scalar(cur, cur)
    return re.astype(np.uint32), im.astype(np.uint32)


@functools.partial(jax.jit, static_argnames=("log_n", "log_blowup", "shift"))
def lde(re, im, log_n: int, log_blowup: int,
        shift: Tuple[int, int] = (1, 0)):
    """Low-degree extension: evaluations on the size-2^log_n subgroup ->
    evaluations on the coset ``shift * <w>`` of the size-2^(log_n +
    log_blowup) subgroup.

    With the default shift (1, 0) the larger subgroup strictly contains the
    smaller one, so committed values include the originals at stride
    2^log_blowup.  STARK quotient evaluation uses a proper coset (shift
    outside the subgroup) so the trace-domain vanishing polynomial is
    nonzero on every committed point.
    """
    coef_r, coef_i = intt(re, im, log_n)
    big = 1 << (log_n + log_blowup)
    pad = [(0, 0)] * (coef_r.ndim - 1) + [(0, big - (1 << log_n))]
    coef_r = jnp.pad(coef_r, pad)
    coef_i = jnp.pad(coef_i, pad)
    if shift != (1, 0):
        spow_r, spow_i = _shift_powers(shift, log_n + log_blowup)
        coef_r, coef_i = cm31_mul(
            (coef_r, coef_i), (jnp.asarray(spow_r), jnp.asarray(spow_i)))
    return ntt(coef_r, coef_i, log_n + log_blowup)


@functools.partial(jax.jit, static_argnames=("log_n", "shift"))
def coset_ntt(re, im, log_n: int, shift: Tuple[int, int] = (1, 0)):
    """Coefficients -> evaluations on the coset ``shift * <w>``:
    NTT of (coeff_i * shift^i)."""
    if shift != (1, 0):
        spow_r, spow_i = _shift_powers(shift, log_n)
        re, im = cm31_mul((re, im),
                          (jnp.asarray(spow_r), jnp.asarray(spow_i)))
    return ntt(re, im, log_n)


@functools.partial(jax.jit, static_argnames=("log_n", "shift"))
def coset_intt(re, im, log_n: int, shift: Tuple[int, int] = (1, 0)):
    """Evaluations on the coset ``shift * <w>`` -> coefficients:
    iNTT then divide coeff_i by shift^i."""
    coef_r, coef_i = intt(re, im, log_n)
    if shift != (1, 0):
        sinv = cm31_inv_scalar(shift)
        spow_r, spow_i = _shift_powers(sinv, log_n)
        coef_r, coef_i = cm31_mul(
            (coef_r, coef_i), (jnp.asarray(spow_r), jnp.asarray(spow_i)))
    return coef_r, coef_i


def domain_points(log_n: int) -> Tuple[np.ndarray, np.ndarray]:
    """The evaluation domain w^0..w^(n-1) as numpy uint32 pairs."""
    return _twiddle_table(log_n, inverse=False)
