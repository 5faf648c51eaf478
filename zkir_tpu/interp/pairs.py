"""u32-pair arithmetic: 64-bit machine words as (lo, hi) uint32 arrays.

TPU VPUs have no native 64-bit integer lanes — XLA *emulates* u64, and the
emulation defeats fusion and roughly halves VPU throughput.  The interpreter
therefore carries every 64-bit machine quantity (registers, pc, addresses,
immediates) as a pair of uint32 arrays and does the carry propagation
explicitly.  All helpers below are branch-free and elementwise, so whole
expression trees fuse into single VPU kernels.

A "pair" is a plain tuple ``(lo, hi)`` of equal-shaped ``uint32`` arrays.
Reference semantics being reproduced: the wrapping u64 arithmetic of
``zkir-runtime/src/execute.rs:35-673`` and ``zkir-spec/src/value.rs``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32
i32 = jnp.int32

_M40_LO = np.uint32(0xFFFFFFFF)
_M40_HI = np.uint32(0xFF)


def const(value: int, like=None):
    """A pair holding a Python integer constant (broadcastable scalar)."""
    lo = u32(value & 0xFFFFFFFF)
    hi = u32((value >> 32) & 0xFFFFFFFF)
    if like is not None:
        lo = jnp.full_like(like, lo)
        hi = jnp.full_like(like, hi)
    return lo, hi


def from_u64_np(arr):
    """numpy u64 array -> pair of numpy u32 arrays (host boundary)."""
    arr = np.asarray(arr, dtype=np.uint64)
    return (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (arr >> np.uint64(32)).astype(np.uint32)


def to_u64_np(lo, hi):
    """Pair of numpy u32 arrays -> numpy u64 array (host boundary)."""
    return np.asarray(lo, dtype=np.uint64) \
        | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    carry = (lo < alo).astype(u32)
    return lo, ahi + bhi + carry


def add_small(a, k: int):
    """a + k for a small non-negative Python int constant."""
    alo, ahi = a
    lo = alo + u32(k)
    carry = (lo < alo).astype(u32)
    return lo, ahi + carry


def sub(a, b):
    alo, ahi = a
    blo, bhi = b
    borrow = (alo < blo).astype(u32)
    return alo - blo, ahi - bhi - borrow


def neg(a):
    return sub((u32(0), u32(0)), a)


def band(a, b):
    return a[0] & b[0], a[1] & b[1]


def bor(a, b):
    return a[0] | b[0], a[1] | b[1]


def bxor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def mask40(a):
    """Truncate to the 40-bit data width (Value40 wrap)."""
    return a[0], a[1] & u32(_M40_HI)


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] == u32(0)) & (a[1] == u32(0))


def ltu(a, b):
    """Unsigned 64-bit a < b."""
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def geu(a, b):
    return ~ltu(a, b)


def select(cond, a, b):
    """Elementwise where over pairs."""
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


def shl(a, s):
    """a << s for traced s in [0, 63] (s: u32/i32 array or scalar)."""
    alo, ahi = a
    s = s.astype(u32) if hasattr(s, "astype") else u32(s)
    small = s < u32(32)
    s_lo = jnp.where(small, s, u32(0))
    s_hi = jnp.where(small, u32(0), s - u32(32))
    # s < 32 case; (32 - s_lo) & 31 avoids the undefined shift at s_lo == 0,
    # and the result is masked to zero there.
    cross = jnp.where(s_lo == 0, u32(0), alo >> ((u32(32) - s_lo) & u32(31)))
    lo1 = alo << s_lo
    hi1 = (ahi << s_lo) | cross
    hi2 = alo << s_hi
    return jnp.where(small, lo1, u32(0)), jnp.where(small, hi1, hi2)


def shr(a, s):
    """Logical a >> s for traced s in [0, 63]."""
    alo, ahi = a
    s = s.astype(u32) if hasattr(s, "astype") else u32(s)
    small = s < u32(32)
    s_lo = jnp.where(small, s, u32(0))
    s_hi = jnp.where(small, u32(0), s - u32(32))
    cross = jnp.where(s_lo == 0, u32(0), ahi << ((u32(32) - s_lo) & u32(31)))
    lo1 = (alo >> s_lo) | cross
    hi1 = ahi >> s_lo
    lo2 = ahi >> s_hi
    return jnp.where(small, lo1, lo2), jnp.where(small, hi1, u32(0))


def shl_const(a, s: int):
    """a << s for a Python int constant in [0, 63]."""
    alo, ahi = a
    if s == 0:
        return a
    if s < 32:
        return alo << u32(s), (ahi << u32(s)) | (alo >> u32(32 - s))
    return jnp.zeros_like(alo), alo << u32(s - 32)


def shr_const(a, s: int):
    """a >> s (logical) for a Python int constant in [0, 63]."""
    alo, ahi = a
    if s == 0:
        return a
    if s < 32:
        return (alo >> u32(s)) | (ahi << u32(32 - s)), ahi >> u32(s)
    return ahi >> u32(s - 32), jnp.zeros_like(ahi)


def mul32(a, b):
    """Full 32x32 -> 64 product of two u32 arrays, as a pair.

    16-bit split multiply — TPU int32 multiplies return only the low 32
    bits, so the high half is reconstructed from four 16x16 partials
    (the same trick as the Pallas M31 kernel in ``ops/field_ops.py``).
    """
    m16 = u32(0xFFFF)
    al, ah = a & m16, a >> u32(16)
    bl, bh = b & m16, b >> u32(16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> u32(16)) + (lh & m16) + (hl & m16)   # <= ~2^18, no wrap
    lo = (ll & m16) | (mid << u32(16))
    hi = hh + (lh >> u32(16)) + (hl >> u32(16)) + (mid >> u32(16))
    return lo, hi


def mul_lo(a, b):
    """Low 64 bits of the 64x64 product (wrapping u64 multiply)."""
    lo, hi = mul32(a[0], b[0])
    hi = hi + a[0] * b[1] + a[1] * b[0]   # u32 wrap is correct here
    return lo, hi


def mul_full(a, b):
    """Full 64x64 -> 128 product: returns (lo_pair, hi_pair).

    Grade-school over 32-bit limbs with explicit carry chains; used only
    by MULH (bits [40..104) of the raw-u64 product, execute.rs:101-115).
    """
    p00 = mul32(a[0], b[0])
    p01 = mul32(a[0], b[1])
    p10 = mul32(a[1], b[0])
    p11 = mul32(a[1], b[1])
    r0 = p00[0]
    s1 = p00[1] + p01[0]
    c1 = (s1 < p00[1]).astype(u32)
    s1b = s1 + p10[0]
    c1b = (s1b < s1).astype(u32)
    r1 = s1b
    s2 = p01[1] + p10[1]
    c2 = (s2 < p01[1]).astype(u32)
    s2b = s2 + p11[0]
    c2b = (s2b < s2).astype(u32)
    s2c = s2b + c1 + c1b
    c2c = (s2c < s2b).astype(u32)
    r2 = s2c
    r3 = p11[1] + c2 + c2b + c2c
    return (r0, r1), (r2, r3)


def divmod_u(a, b):
    """Unsigned 64-bit (a // b, a % b); callers guarantee b != 0.

    Branch-free restoring long division: 64 shift-compare-subtract steps
    under ``fori_loop`` (compiles small, runs entirely on the VPU).  Only
    instantiated when the program statically contains DIV-family opcodes.
    """
    alo, ahi = a
    blo, bhi = b
    zeros = jnp.zeros_like(alo)

    def body(i, st):
        qlo, qhi, rlo, rhi = st
        j = u32(63) - i.astype(u32)
        bit = jnp.where(
            j < u32(32),
            (alo >> (j & u32(31))) & u32(1),
            (ahi >> ((j - u32(32)) & u32(31))) & u32(1),
        )
        rhi = (rhi << u32(1)) | (rlo >> u32(31))
        rlo = (rlo << u32(1)) | bit
        ge = (rhi > bhi) | ((rhi == bhi) & (rlo >= blo))
        borrow = (rlo < blo).astype(u32)
        rlo = jnp.where(ge, rlo - blo, rlo)
        rhi = jnp.where(ge, rhi - bhi - borrow, rhi)
        qlo = qlo | jnp.where(ge & (j < u32(32)),
                              u32(1) << (j & u32(31)), u32(0))
        qhi = qhi | jnp.where(ge & (j >= u32(32)),
                              u32(1) << ((j - u32(32)) & u32(31)), u32(0))
        return qlo, qhi, rlo, rhi

    qlo, qhi, rlo, rhi = jax.lax.fori_loop(
        0, 64, body, (zeros, zeros, zeros, zeros))
    return (qlo, qhi), (rlo, rhi)


def bit_length(a):
    """Number of significant bits of the 64-bit value (0 for 0)."""
    hi_nz = a[1] != u32(0)
    clz_hi = jax.lax.clz(a[1]).astype(i32)
    clz_lo = jax.lax.clz(a[0]).astype(i32)
    return jnp.where(
        hi_nz, 64 - clz_hi,
        jnp.where(a[0] != u32(0), 32 - clz_lo, 0),
    )
