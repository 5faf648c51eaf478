"""Batched Poseidon2 permutation over Mersenne-31.

Vectorized (jnp) and Pallas implementations of the width-16 permutation
defined by ``zkir_tpu.ops.poseidon2_ref`` (differential-tested against the
scalar reference).  States are ``uint32 [N, 16]`` arrays of canonical field
elements; the whole batch advances through the rounds in lockstep — the
shape the TPU VPU wants (N up to 2^18+ per the north-star config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_ops import m31_add, m31_mul, m31_mul32
from .poseidon2_ref import (
    RATE,
    ROUNDS_F,
    ROUNDS_P,
    WIDTH,
    poseidon2_params,
)


@functools.lru_cache(maxsize=None)
def _params_np():
    external, internal, diag = poseidon2_params()
    p = (1 << 31) - 1
    dm1 = [(d - 1) % p for d in diag]
    return (
        np.asarray(external, dtype=np.uint32),     # [ROUNDS_F, 16]
        np.asarray(internal, dtype=np.uint32),     # [ROUNDS_P]
        np.asarray(dm1, dtype=np.uint32),          # [16] = diag - 1 mod p
    )


def _sbox(x, mul):
    x2 = mul(x, x)
    x4 = mul(x2, x2)
    return mul(x4, x)


def _external_matrix(x, mul):
    """M_E = circ(2*M4, M4, M4, M4) on [..., 16] arrays.

    Uses the additive form: per-4-block M4 product plus the cross-block
    sums (see poseidon2_ref._external_matrix).
    """
    blocks = x.reshape(*x.shape[:-1], 4, 4)
    x0 = blocks[..., 0]
    x1 = blocks[..., 1]
    x2 = blocks[..., 2]
    x3 = blocks[..., 3]
    t0 = m31_add(x0, x1)
    t1 = m31_add(x2, x3)
    t2 = m31_add(m31_add(x1, x1), t1)
    t3 = m31_add(m31_add(x3, x3), t0)
    t4 = m31_add(m31_add(m31_add(t1, t1), m31_add(t1, t1)), t3)
    t5 = m31_add(m31_add(m31_add(t0, t0), m31_add(t0, t0)), t2)
    t6 = m31_add(t3, t5)
    t7 = m31_add(t2, t4)
    y = jnp.stack([t6, t5, t7, t4], axis=-1)  # [..., 4, 4]
    # Cross-block sums via a pairwise field-add tree (stays in uint32 —
    # Mosaic-compatible, no u64).
    sums = m31_add(m31_add(y[..., 0, :], y[..., 1, :]),
                   m31_add(y[..., 2, :], y[..., 3, :]))
    out = m31_add(y, sums[..., None, :])
    return out.reshape(*x.shape[:-1], 16)


def _internal_matrix(x, dm1, mul):
    """(M_I x)_i = sum(x) + (diag_i - 1) * x_i on [..., 16].

    ``dm1`` is the precomputed (diag - 1) mod p vector.  The total is a
    pairwise field-add tree (uint32-only, Mosaic-compatible)."""
    t = x
    while t.shape[-1] > 1:
        t = m31_add(t[..., 0::2], t[..., 1::2])
    total = t[..., 0]
    return m31_add(total[..., None], mul(x, dm1))


def _permute(x, external, internal, diag, mul):
    x = _external_matrix(x, mul)
    half = ROUNDS_F // 2
    for r in range(half):
        x = _sbox(m31_add(x, external[r]), mul)
        x = _external_matrix(x, mul)
    for r in range(ROUNDS_P):
        x0 = _sbox(m31_add(x[..., 0], internal[r]), mul)
        # Concatenate instead of scatter (Mosaic has no scatter lowering).
        x = jnp.concatenate([x0[..., None], x[..., 1:]], axis=-1)
        x = _internal_matrix(x, diag, mul)
    for r in range(half, ROUNDS_F):
        x = _sbox(m31_add(x, external[r]), mul)
        x = _external_matrix(x, mul)
    return x


def _ext_matrix_t(x):
    """External matrix on the transposed [16, N] layout (batch on the lane
    axis — the TPU-native orientation; ~1.7x over [N, 16])."""
    b = x.reshape(4, 4, -1)
    x0, x1, x2, x3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]  # each [4, N]
    t0 = m31_add(x0, x1)
    t1 = m31_add(x2, x3)
    t2 = m31_add(m31_add(x1, x1), t1)
    t3 = m31_add(m31_add(x3, x3), t0)
    t4 = m31_add(m31_add(m31_add(t1, t1), m31_add(t1, t1)), t3)
    t5 = m31_add(m31_add(m31_add(t0, t0), m31_add(t0, t0)), t2)
    t6 = m31_add(t3, t5)
    t7 = m31_add(t2, t4)
    y = jnp.stack([t6, t5, t7, t4], axis=1)  # [4, 4, N]
    sums = m31_add(m31_add(y[0], y[1]), m31_add(y[2], y[3]))  # [4, N]
    return m31_add(y, sums[None]).reshape(16, -1)


def _int_matrix_t(x, dm1):
    t = x
    while t.shape[0] > 1:
        h = t.shape[0] // 2
        t = m31_add(t[:h], t[h:])
    return m31_add(t, m31_mul(x, dm1[:, None]))


def _permute_t(x, external, internal, dm1):
    """Permutation on [16, N]."""
    x = _ext_matrix_t(x)
    half = ROUNDS_F // 2
    for r in range(half):
        x = _sbox(m31_add(x, external[r][:, None]), m31_mul)
        x = _ext_matrix_t(x)
    for r in range(ROUNDS_P):
        x0 = _sbox(m31_add(x[0:1], internal[r]), m31_mul)
        x = jnp.concatenate([x0, x[1:]], axis=0)
        x = _int_matrix_t(x, dm1)
    for r in range(half, ROUNDS_F):
        x = _sbox(m31_add(x, external[r][:, None]), m31_mul)
        x = _ext_matrix_t(x)
    return x


@jax.jit
def poseidon2_permute_batch(states):
    """Permute a batch of states: uint32 [N, 16] -> [N, 16].

    Internally runs on the transposed [16, N] layout so the batch rides
    the 128-lane axis."""
    external, internal, dm1 = _params_np()
    out = _permute_t(states.T, jnp.asarray(external), jnp.asarray(internal),
                     jnp.asarray(dm1))
    return out.T


@jax.jit
def poseidon2_compress_batch(left, right):
    """Batched 2-to-1 Merkle compression: uint32 [N, 8] x [N, 8] -> [N, 8].

    permute(left || right)[:8] + left (matches poseidon2_ref.poseidon2_compress).
    """
    state = jnp.concatenate([left, right], axis=-1)
    out = poseidon2_permute_batch(state)
    return m31_add(out[..., :RATE], left)


@jax.jit
def poseidon2_sponge_batch(blocks):
    """Batched sponge over pre-padded rate blocks.

    blocks: uint32 [N, n_blocks, RATE] (already 1||0* padded).
    Returns uint32 [N, RATE].

    One dispatch for any block count: ``lax.scan`` over the block axis
    traces the permutation body ONCE (unrolling it n_blocks times made
    XLA compile minutes-long for wide matrices).
    """
    state = jnp.zeros((blocks.shape[0], WIDTH), dtype=jnp.uint32)

    def absorb(state, block):
        state = state.at[:, :RATE].set(m31_add(state[:, :RATE], block))
        return poseidon2_permute_batch(state), None

    state, _ = jax.lax.scan(absorb, state, jnp.swapaxes(blocks, 0, 1))
    return state[:, :RATE]


# ============================================================================
# Pallas kernel
# ============================================================================


def _ext_matrix_2d(x, mul):
    """External matrix on [tile, 16] using only contiguous 2-D slices and
    concatenation — the op set Mosaic lowers cleanly (no reshape-to-3D,
    no strided gathers)."""
    ys = []
    for b in range(4):
        blk = x[:, 4 * b: 4 * b + 4]
        x0 = blk[:, 0:1]
        x1 = blk[:, 1:2]
        x2 = blk[:, 2:3]
        x3 = blk[:, 3:4]
        t0 = m31_add(x0, x1)
        t1 = m31_add(x2, x3)
        t2 = m31_add(m31_add(x1, x1), t1)
        t3 = m31_add(m31_add(x3, x3), t0)
        t4 = m31_add(m31_add(m31_add(t1, t1), m31_add(t1, t1)), t3)
        t5 = m31_add(m31_add(m31_add(t0, t0), m31_add(t0, t0)), t2)
        t6 = m31_add(t3, t5)
        t7 = m31_add(t2, t4)
        ys.append(jnp.concatenate([t6, t5, t7, t4], axis=1))  # [tile, 4]
    sums = m31_add(m31_add(ys[0], ys[1]), m31_add(ys[2], ys[3]))
    return jnp.concatenate([m31_add(y, sums) for y in ys], axis=1)


def _internal_matrix_2d(x, dm1_row, mul):
    """Internal matrix on [tile, 16]: halving-tree row sum + diagonal."""
    t = x
    while t.shape[1] > 1:
        h = t.shape[1] // 2
        t = m31_add(t[:, :h], t[:, h:])
    return m31_add(t, mul(x, dm1_row))  # t broadcasts [tile, 1]


def _poseidon2_kernel(ext_ref, int_ref, diag_ref, x_ref, out_ref):
    x = x_ref[:]  # [tile, 16]
    external = ext_ref[:]
    internal = int_ref[:]
    diag_row = diag_ref[:]  # [1, 16] = diag - 1
    mul = m31_mul32

    def ext_round(x, r):
        x = _sbox(m31_add(x, external[r: r + 1, :]), mul)
        return _ext_matrix_2d(x, mul)

    x = _ext_matrix_2d(x, mul)
    half = ROUNDS_F // 2
    for r in range(half):
        x = ext_round(x, r)
    for r in range(ROUNDS_P):
        x0 = _sbox(m31_add(x[:, 0:1], internal[r: r + 1, :]), mul)
        x = jnp.concatenate([x0, x[:, 1:]], axis=1)
        x = _internal_matrix_2d(x, diag_row, mul)
    for r in range(half, ROUNDS_F):
        x = ext_round(x, r)
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def poseidon2_permute_pallas(states, interpret: bool = False):
    """Pallas TPU kernel for the batched permutation (uint32 [N, 16])."""
    external, internal, diag = _params_np()
    n = states.shape[0]
    tile = min(n, 1024)
    grid = (n // tile,) if n % tile == 0 else (pl.cdiv(n, tile),)
    return pl.pallas_call(
        _poseidon2_kernel,
        out_shape=jax.ShapeDtypeStruct(states.shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROUNDS_F, WIDTH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROUNDS_P, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIDTH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, WIDTH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray(external),
        jnp.asarray(internal)[:, None],
        jnp.asarray(diag)[None, :],
        states,
    )
