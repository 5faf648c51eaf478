"""Vectorized Merkle tree over Poseidon2-M31 digests.

The commitment layer of the Plonky3-style pipeline: leaf digests are
Poseidon2 sponge hashes of matrix rows, internal nodes use the batched
2-to-1 compression.  Each level is one batched kernel call — a tree of
2^k leaves builds in k device steps.

Digests are 8-element M31 vectors (uint32 [..., 8]).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .poseidon2 import poseidon2_compress_batch, poseidon2_sponge_batch
from .poseidon2_ref import RATE

DIGEST_WIDTH = RATE  # 8 field elements


def hash_rows(matrix) -> jnp.ndarray:
    """Hash each row of a uint32 [n, w] matrix to a digest [n, 8].

    Rows are split into rate-8 blocks with the sponge's 1||0* padding
    (always appended, matching poseidon2_ref.poseidon2_sponge).
    """
    n, w = matrix.shape
    padded_w = ((w + 1 + RATE - 1) // RATE) * RATE
    pad = jnp.zeros((n, padded_w - w), dtype=jnp.uint32)
    pad = pad.at[:, 0].set(1)
    blocks = jnp.concatenate([matrix, pad], axis=1)
    blocks = blocks.reshape(n, padded_w // RATE, RATE)
    return poseidon2_sponge_batch(blocks)


def build_tree(leaves) -> List[jnp.ndarray]:
    """Build a Merkle tree from leaf digests uint32 [n, 8] (n a power of 2).

    Returns levels[0] = leaves .. levels[-1] = [1, 8] root."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = poseidon2_compress_batch(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


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
    """Recompute the root from a leaf and its sibling path."""
    cur = jnp.asarray(leaf_digest, dtype=jnp.uint32)[None, :]
    for sibling in path:
        sib = jnp.asarray(sibling, dtype=jnp.uint32)[None, :]
        if index & 1:
            cur = poseidon2_compress_batch(sib, cur)
        else:
            cur = poseidon2_compress_batch(cur, sib)
        index >>= 1
    return bool(np.array_equal(np.asarray(cur[0]), np.asarray(root_digest)))
