"""Vectorized Merkle tree over Poseidon2-M31 digests.

The commitment layer of the Plonky3-style pipeline: leaf digests are
Poseidon2 sponge hashes of matrix rows, internal nodes use the batched
2-to-1 compression.  Each level is one batched kernel call — a tree of
2^k leaves builds in k device steps.

Digests are 8-element M31 vectors (uint32 [..., 8]).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .poseidon2 import poseidon2_compress_batch, poseidon2_sponge_batch
from .poseidon2_ref import RATE

DIGEST_WIDTH = RATE  # 8 field elements


@jax.jit
def hash_rows(matrix) -> jnp.ndarray:
    """Hash each row of a uint32 [n, w] matrix to a digest [n, 8].

    Rows are split into rate-8 blocks with the sponge's 1||0* padding
    (always appended, matching poseidon2_ref.poseidon2_sponge).
    One dispatch for the whole matrix (the sponge scans over blocks).
    """
    n, w = matrix.shape
    padded_w = ((w + 1 + RATE - 1) // RATE) * RATE
    pad = jnp.zeros((n, padded_w - w), dtype=jnp.uint32)
    pad = pad.at[:, 0].set(1)
    blocks = jnp.concatenate([matrix, pad], axis=1)
    blocks = blocks.reshape(n, padded_w // RATE, RATE)
    return poseidon2_sponge_batch(blocks)


@jax.jit
def _absorb_blocks(states, blocks):
    """Advance row-sponge states [n, WIDTH] over rate blocks [n, nb, 8]."""
    from .poseidon2 import poseidon2_permute_batch
    from ..ops.field_ops import m31_add

    def step(s, blk):
        s = s.at[:, :RATE].set(m31_add(s[:, :RATE], blk))
        return poseidon2_permute_batch(s), None

    out, _ = jax.lax.scan(step, states, jnp.swapaxes(blocks, 0, 1))
    return out


class RowSponge:
    """Incremental row hashing: feed a [n, w] matrix column-chunk by
    column-chunk and get exactly ``hash_rows``'s digests.

    The streaming prover commits wide matrices one column block at a
    time (peak HBM = O(block x domain), not O(all columns x domain));
    this keeps ONE Merkle tree / one opening path per query regardless
    of how many blocks streamed in."""

    def __init__(self, n: int):
        from .poseidon2_ref import WIDTH

        self.n = n
        self.states = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
        self.pending = jnp.zeros((n, 0), dtype=jnp.uint32)

    def absorb(self, chunk) -> None:
        buf = jnp.concatenate([self.pending, chunk], axis=1)
        nb = buf.shape[1] // RATE
        if nb:
            blocks = buf[:, : nb * RATE].reshape(self.n, nb, RATE)
            self.states = _absorb_blocks(self.states, blocks)
        self.pending = buf[:, nb * RATE:]

    def finalize(self) -> jnp.ndarray:
        """Append the 1||0* padding and return digests [n, 8]."""
        w = self.pending.shape[1]
        pad = jnp.zeros((self.n, RATE - w), dtype=jnp.uint32)
        pad = pad.at[:, 0].set(1)
        last = jnp.concatenate([self.pending, pad], axis=1)
        states = _absorb_blocks(self.states,
                                last.reshape(self.n, 1, RATE))
        return states[:, :RATE]


def build_tree(leaves) -> List[jnp.ndarray]:
    """Build a Merkle tree from leaf digests uint32 [n, 8] (n a power of 2).

    Returns levels[0] = leaves .. levels[-1] = [1, 8] root.  One
    dispatch per level via the jitted batched compression (jitting the
    whole loop would inline the permutation log2(n) times — minutes of
    XLA compile for no dispatch win worth it)."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = poseidon2_compress_batch(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


@jax.jit
def _tree_levels_jit(leaves):
    """All tree levels as ONE dispatch (the per-level loop unrolls at
    trace time).  Right for the FRI commit phase, whose many small
    per-layer trees otherwise cost log^2(n) round trips over a
    remote-TPU link; the persistent cache amortizes the one-time
    unrolled compile per leaf count."""
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = poseidon2_compress_batch(cur[0::2], cur[1::2])
        levels.append(cur)
    return tuple(levels)


def build_tree_fused(leaves) -> List[jnp.ndarray]:
    return list(_tree_levels_jit(leaves))


def to_host(levels: List[jnp.ndarray]) -> List[np.ndarray]:
    """Materialize tree levels on the host in one batch (path opening is
    host-side random access; per-sibling device readbacks are ruinous
    over a remote-TPU link)."""
    import jax

    return [np.asarray(l) for l in jax.device_get(levels)]


def hash_row_host(row) -> List[int]:
    """Host-scalar digest of one row, identical to ``hash_rows`` on a
    [1, w] matrix (1||0* rate padding + sponge) — used by verifiers,
    where one row per query beats a device round-trip."""
    from .poseidon2_ref import poseidon2_sponge

    return poseidon2_sponge([int(x) for x in row])


def root(levels: List[jnp.ndarray]) -> np.ndarray:
    return np.asarray(levels[-1][0])


def open_path(levels: List[jnp.ndarray], index: int) -> List[np.ndarray]:
    """Sibling digests from leaf to root for one leaf index."""
    path = []
    for level in levels[:-1]:
        sibling = index ^ 1
        path.append(np.asarray(level[sibling]))
        index >>= 1
    return path


def verify_path(root_digest, index: int, leaf_digest,
                path: List[np.ndarray]) -> bool:
    """Recompute the root from a leaf and its sibling path.

    Host-scalar: a verifier touches one leaf per level — a Python
    permutation per step beats a device dispatch round-trip."""
    from .poseidon2_ref import poseidon2_compress

    cur = [int(x) for x in np.asarray(leaf_digest)]
    for sibling in path:
        sib = [int(x) for x in np.asarray(sibling)]
        cur = (poseidon2_compress(sib, cur) if index & 1
               else poseidon2_compress(cur, sib))
        index >>= 1
    return cur == [int(x) for x in np.asarray(root_digest)]
