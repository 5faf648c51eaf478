"""Distributed kernels: four-step NTT, sharded Merkle, sharded trace gen.

The communication design (SURVEY §2.4 / §5):

- NTT: the classic four-step factorization n = n1 x n2.  Column NTTs are
  local to each shard, the twiddle multiply is elementwise, and the single
  transpose is one ``all_to_all`` over the mesh axis — the only inter-chip
  traffic, riding ICI.  Cross-shard butterfly ``ppermute`` chains are
  avoided entirely.
- Merkle: each chip hashes and reduces its row shard to a subtree root,
  roots are ``all_gather``-ed (log-size traffic), and every chip computes
  the identical top of the tree.
- Trace generation: interpreter lanes are pure data parallelism — the
  machine state's leading lane axis is sharded with a NamedSharding and the
  jitted step runs without modification.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import merkle as merkle_ops
from ..ops.ntt import _twiddle_table, cm31_mul, ntt
from ..spec.field import M31_PRIME


# ============================================================================
# Four-step distributed NTT
# ============================================================================


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(log_n1: int, log_n2: int) -> Tuple[np.ndarray, np.ndarray]:
    """Twiddle matrix T[k1, j2] = w_n^(k1 * j2) as uint32 pairs."""
    log_n = log_n1 + log_n2
    n = 1 << log_n
    twr, twi = _twiddle_table(log_n, inverse=False)
    k1 = np.arange(1 << log_n1, dtype=np.int64)[:, None]
    j2 = np.arange(1 << log_n2, dtype=np.int64)[None, :]
    idx = (k1 * j2) % n
    return twr[idx], twi[idx]


def dist_ntt(re, im, mesh: Mesh, log_n: int, axis: str = "d"):
    """Distributed forward NTT of a 2^log_n vector.

    Input viewed as row-major [n1, n2] with j = j1*n2 + j2; output Z[k1, k2]
    satisfies X[k1 + n1*k2] = Z[k1, k2] (read natural order with
    ``Z.T.ravel()``).  Input arrives sharded over columns (P(None, axis)),
    output leaves sharded over rows (P(axis, None)); the reshard in the
    middle is one all_to_all.
    """
    n_dev = mesh.devices.size
    log_d = n_dev.bit_length() - 1
    assert 1 << log_d == n_dev, "device count must be a power of two"
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    assert log_n1 >= log_d and log_n2 >= log_d, "domain too small for mesh"
    n1, n2 = 1 << log_n1, 1 << log_n2

    twr_np, twi_np = _four_step_twiddles(log_n1, log_n2)
    twr = jnp.asarray(twr_np)
    twi = jnp.asarray(twi_np)

    re2 = re.reshape(n1, n2)
    im2 = im.reshape(n1, n2)

    def local(re_blk, im_blk, twr_blk, twi_blk):
        # Step 1: length-n1 NTTs along axis 0 (local columns).
        r = re_blk.T  # [n2/D, n1]
        i = im_blk.T
        r, i = ntt(r, i, log_n1)
        r, i = r.T, i.T  # [n1, n2/D]
        # Step 2: twiddle multiply (local block of T).
        r, i = cm31_mul((r, i), (twr_blk, twi_blk))
        # Step 3: transpose reshard [n1, n2/D] -> [n1/D, n2].
        r = jax.lax.all_to_all(r, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        i = jax.lax.all_to_all(i, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        # Step 4: length-n2 NTTs along axis 1 (local rows).
        r, i = ntt(r, i, log_n2)
        return r, i

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return shard(re2, im2, twr, twi)


def dist_ntt_natural(re, im, mesh: Mesh, log_n: int, axis: str = "d"):
    """Distributed NTT returning the 1-D natural-order result (for tests)."""
    zr, zi = dist_ntt(re, im, mesh, log_n, axis)
    return zr.T.reshape(-1), zi.T.reshape(-1)


def dist_lde(cols_r, cols_i, mesh: Mesh, log_n: int, log_blowup: int,
             shift=(1, 0), axis: str = "d"):
    """Column-sharded low-degree extension (the polynomial/limb "tensor
    parallel" axis of SURVEY §2.4): each device extends its column subset
    locally — zero communication; pairs with row-sharded commitment.

    cols_r/cols_i: uint32 [n_cols, 2^log_n]; n_cols must divide evenly over
    the mesh (pad with zero columns if needed)."""
    from ..ops.ntt import lde as lde_local

    def local(r, i):
        return lde_local(r, i, log_n, log_blowup, shift=shift)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return shard(cols_r, cols_i)


# ============================================================================
# Distributed Merkle
# ============================================================================


def dist_merkle_root(matrix, mesh: Mesh, axis: str = "d"):
    """Merkle root of row-sharded matrix [n, w]: per-shard subtrees, then an
    all_gather of subtree roots and a replicated top tree.

    Equals the single-chip tree root for power-of-two row counts."""

    def local(rows):
        leaves = merkle_ops.hash_rows(rows)
        cur = leaves
        while cur.shape[0] > 1:
            cur = merkle_ops.poseidon2_compress_batch(cur[0::2], cur[1::2])
        sub_root = cur  # [1, 8]
        roots = jax.lax.all_gather(sub_root[0], axis)  # [D, 8]
        top = roots
        while top.shape[0] > 1:
            top = merkle_ops.poseidon2_compress_batch(top[0::2], top[1::2])
        return top  # [1, 8] replicated

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(None, None),
        # The all_gather makes the output replicated; the static varying-
        # axes checker can't prove it, so disable the check.
        check_vma=False,
    )
    return shard(matrix)[0]


# ============================================================================
# Sharded trace generation
# ============================================================================


def sharded_interpreter_state(state, mesh: Mesh, axis: str = "d"):
    """Shard a MachineState's lane axis over the mesh (data parallelism)."""

    def shard_leaf(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(shard_leaf, state)


# ============================================================================
# One sharded prove step (used by dryrun_multichip and scaling tests)
# ============================================================================


def prove_step_sharded(interp, state, mesh: Mesh, log_n: int = 12,
                       axis: str = "d"):
    """One jitted end-to-end step over the mesh: a chunk of sharded trace
    generation (dp over lanes), a distributed NTT of a trace-derived column
    (sp over rows + all_to_all), and a distributed Merkle root
    (all_gather).  Returns (new_state, root)."""

    n_inputs = jnp.int32(interp.n_words)

    def step(code, state):
        new_state, _ = _chunk_body(interp, code, n_inputs, state)
        # Derive a field column from the register file: low 20 bits of all
        # lane registers, padded/tiled to 2^log_n.
        col = new_state.regs_lo.reshape(-1) & jnp.uint32(0xFFFFF)
        n = 1 << log_n
        reps = n // col.shape[0] + 1
        col = jnp.tile(col, reps)[:n] % jnp.uint32(M31_PRIME)
        zero = jnp.zeros_like(col)
        zr, zi = dist_ntt(col, zero, mesh, log_n, axis)
        rows = jnp.stack([zr.reshape(-1), zi.reshape(-1)], axis=1)
        root = dist_merkle_root(rows, mesh, axis)
        return new_state, root

    return step(interp.code, state)


def _chunk_body(interp, code, n_words, state):
    return interp.chunk_fn(code, n_words, state)
