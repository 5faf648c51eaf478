"""Vectorized Mersenne-31 field arithmetic.

The reference defines scalar M31 arithmetic (``zkir-spec/src/field.rs``) that
its interpreter never uses; in the TPU build this layer is the foundation of
the commitment pipeline (NTT / Merkle / FRI) and the Poseidon2 kernel, so it
is engineered for throughput:

- **jnp path** (`m31_*`): uint32 lane arithmetic with a single widening to
  uint64 only inside multiplication.  Works under jit on any backend and is
  the correctness baseline.
- **Pallas path** (`m31_mul_pallas`): 16-bit-split multiplication that stays
  entirely in 32-bit integer ops — the TPU VPU-native formulation (no u64
  emulation).  Used for large batched field workloads.

All functions operate elementwise on arrays of canonical values in [0, p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python int so kernels don't capture a traced constant; jnp's weak
# typing keeps uint32 arrays uint32 under ops with Python ints.
P = (1 << 31) - 1
P_INT = (1 << 31) - 1


def _reduce31(x):
    """Reduce x < 2^32 to <= 2^31 via the Mersenne identity (uint32)."""
    return (x & P) + (x >> 31)


def _canon(x):
    """Map a value <= 2^31 into canonical [0, p)."""
    return jnp.where(x >= P, x - P, x)


def m31_add(a, b):
    """Field addition (canonical inputs)."""
    return _canon(a + b)  # a + b < 2^32, no uint32 overflow


def m31_sub(a, b):
    """Field subtraction (canonical inputs)."""
    return _canon(a + (P - b))


def m31_neg(a):
    return jnp.where(a == 0, jnp.uint32(0), P - a)


def m31_mul(a, b):
    """Field multiplication via one widening to uint64."""
    wide = a.astype(jnp.uint64) * b.astype(jnp.uint64)
    lo = (wide & jnp.uint64(P_INT)).astype(jnp.uint32)
    hi = (wide >> 31).astype(jnp.uint32)  # < 2^31
    return _canon(_reduce31(lo + hi))


def m31_mul32(a, b):
    """Field multiplication staying in 32-bit ops (16-bit splits).

    Mosaic-friendly: no 64-bit types.  Used inside Pallas kernels.
    """
    a0 = a & 0xFFFF
    a1 = a >> 16  # < 2^15
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0          # < 2^32 (wraps ok in uint32: exact since < 2^32)
    mid = a0 * b1 + a1 * b0  # < 2^31 + 2^31 = 2^32; exact in uint32
    p11 = a1 * b1          # < 2^30
    # x = p00 + mid*2^16 + p11*2^32 ; reduce using 2^31 = 1 (mod p):
    m_lo = mid & 0x7FFF          # 15 bits
    m_hi = mid >> 15             # < 2^17 ; mid*2^16 = m_lo*2^16 + m_hi*2^31
    t = _reduce31(p00) + m_hi    # <= 2^31 + 2^17
    r1 = _reduce31(t + (m_lo << 16))   # operand < 2^32
    r2 = _reduce31(r1 + (p11 << 1))    # p11*2^32 = 2*p11 (mod p)
    return _canon(r2)


def m31_pow(a, exp: int):
    """Elementwise a^exp for a static integer exponent (square-and-multiply)."""
    result = jnp.ones_like(a)
    base = a
    e = int(exp)
    while e > 0:
        if e & 1:
            result = m31_mul(result, base)
        base = m31_mul(base, base)
        e >>= 1
    return result


def m31_inv(a):
    """Batched inversion via Fermat: a^(p-2).

    The addition chain below evaluates a^(2^31 - 3) in 37 multiplications
    (vs ~60 for naive square-and-multiply over the exponent bits).
    """
    # p - 2 = 2^31 - 3 = 0b1111111111111111111111111111101
    # Build t_k = a^(2^k - 1) incrementally.
    x = a
    x3 = m31_mul(m31_mul(x, x), x)            # a^3
    t2 = x3                                   # a^(2^2 - 1)
    t4 = m31_mul(m31_pow2(t2, 2), t2)         # a^(2^4 - 1)
    t8 = m31_mul(m31_pow2(t4, 4), t4)         # a^(2^8 - 1)
    t16 = m31_mul(m31_pow2(t8, 8), t8)        # a^(2^16 - 1)
    t24 = m31_mul(m31_pow2(t16, 8), t8)       # a^(2^24 - 1)
    t28 = m31_mul(m31_pow2(t24, 4), t4)       # a^(2^28 - 1)
    t29 = m31_mul(m31_pow2(t28, 1), x)        # a^(2^29 - 1)
    # a^(p-2) = a^(2^31 - 3) = (a^(2^29 - 1))^4 * a
    return m31_mul(m31_pow2(t29, 2), x)


def m31_pow2(a, k: int):
    """a^(2^k) by repeated squaring."""
    for _ in range(k):
        a = m31_mul(a, a)
    return a


def m31_batch_inv(a):
    """Montgomery batch inversion over the leading axis: one Fermat
    inversion for the whole batch plus 3(n-1) multiplications.

    Zero entries map to zero (matching projective-coordinate conventions).
    Long 1-D inputs are reshaped to [steps, 2048] so the sequential
    product chain runs 2048 independent lanes wide (each lane is its own
    chain) instead of one scalar chain of n steps.
    """
    if a.ndim == 1 and a.shape[0] > 4096:
        m = a.shape[0]
        lanes = 2048
        steps = -(-m // lanes)
        pad = steps * lanes - m
        ap = jnp.concatenate([a, jnp.ones(pad, a.dtype)]) if pad else a
        return _batch_inv_chain(ap.reshape(steps, lanes)).reshape(-1)[:m]
    return _batch_inv_chain(a)


@jax.jit
def _batch_inv_chain(a):
    n = a.shape[0]
    safe = jnp.where(a == 0, jnp.uint32(1), a)

    def fwd(carry, x):
        nxt = m31_mul(carry, x)
        return nxt, carry

    total, prefix = jax.lax.scan(fwd, jnp.ones_like(a[0]), safe)
    total_inv = m31_inv(total)

    def bwd(carry, xs):
        x, pre = xs
        inv_here = m31_mul(carry, pre)
        nxt = m31_mul(carry, x)
        return nxt, inv_here

    _, invs = jax.lax.scan(bwd, total_inv, (safe, prefix), reverse=True)
    return jnp.where(a == 0, jnp.uint32(0), invs)


# ============================================================================
# Pallas kernels (TPU)
# ============================================================================


def _mul_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = m31_mul32(a_ref[:], b_ref[:])


def _add_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = m31_add(a_ref[:], b_ref[:])


def _sub_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = m31_sub(a_ref[:], b_ref[:])


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def _binary_pallas(a, b, kernel_name: str = "mul", interpret: bool = False):
    kernel = {"mul": _mul_kernel, "add": _add_kernel, "sub": _sub_kernel}[
        kernel_name
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.VMEM
        ),
        interpret=interpret,
    )(a, b)


def m31_mul_pallas(a, b, interpret: bool = False):
    """Pallas M31 multiply (32-bit-only formulation)."""
    return _binary_pallas(a, b, "mul", interpret)


def m31_add_pallas(a, b, interpret: bool = False):
    return _binary_pallas(a, b, "add", interpret)


def m31_sub_pallas(a, b, interpret: bool = False):
    return _binary_pallas(a, b, "sub", interpret)
