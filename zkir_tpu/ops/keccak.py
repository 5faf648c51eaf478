"""Batched Keccak-256 on device.

keccak-f[1600] vectorized over a batch of states: the 5x5 lane array
becomes 25 u64 vectors of batch length, with all rounds unrolled as a
single jitted computation via lax.scan over round constants.  Parity
oracle: ``zkir_tpu.runtime.crypto.keccak256_digest``.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.crypto import _KECCAK_RC, _KECCAK_ROT

_RATE = 136


def _rotl64(x, n: int):
    n %= 64
    if n == 0:
        return x
    return (x << np.uint64(n)) | (x >> np.uint64(64 - n))


@jax.jit
def keccak_f1600_batch(state):
    """state: uint64 [N, 25] with lane (x, y) at index x + 5*y."""

    def round_body(s, rc):
        lanes = [s[:, i] for i in range(25)]

        def at(x, y):
            return lanes[x + 5 * y]

        c = [at(x, 0) ^ at(x, 1) ^ at(x, 2) ^ at(x, 3) ^ at(x, 4)
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        lanes = [lanes[x + 5 * y] ^ d[x]
                 for y in range(5) for x in range(5)]
        # Re-index: the list above is ordered y-major; rebuild x+5y order.
        grid = {}
        idx = 0
        for y in range(5):
            for x in range(5):
                grid[(x, y)] = lanes[idx]
                idx += 1
        # rho + pi
        b = {}
        for x in range(5):
            for y in range(5):
                b[(y, (2 * x + 3 * y) % 5)] = _rotl64(
                    grid[(x, y)], _KECCAK_ROT[x][y])
        # chi
        out = []
        for y in range(5):
            for x in range(5):
                out.append(b[(x, y)]
                           ^ ((~b[((x + 1) % 5, y)]) & b[((x + 2) % 5, y)]))
        # iota
        out[0] = out[0] ^ rc
        # out is ordered y-major (y outer, x inner) == x + 5*y indexing.
        return jnp.stack(out, axis=1), None

    rcs = jnp.asarray(np.asarray(_KECCAK_RC, dtype=np.uint64))
    state, _ = jax.lax.scan(lambda s, rc: round_body(s, rc), state, rcs)
    return state


def keccak256_many(messages: List[bytes]) -> List[bytes]:
    """Keccak-256 of a batch of byte strings (host pad, device permute)."""
    n = len(messages)
    padded = []
    for msg in messages:
        p = bytearray(msg)
        p.append(0x01)
        while len(p) % _RATE != 0:
            p.append(0)
        p[-1] |= 0x80
        padded.append(bytes(p))
    max_blocks = max(len(p) // _RATE for p in padded)

    blocks = np.zeros((n, max_blocks, _RATE // 8), dtype=np.uint64)
    n_blocks = np.zeros(n, dtype=np.int32)
    for i, p in enumerate(padded):
        k = len(p) // _RATE
        n_blocks[i] = k
        blocks[i, :k] = np.frombuffer(p, dtype="<u8").reshape(k, _RATE // 8)

    state = jnp.zeros((n, 25), dtype=jnp.uint64)
    blocks_d = jnp.asarray(blocks)
    nb_d = jnp.asarray(n_blocks)
    for blk in range(max_blocks):
        absorbed = state.at[:, : _RATE // 8].set(
            state[:, : _RATE // 8] ^ blocks_d[:, blk])
        new = keccak_f1600_batch(absorbed)
        state = jnp.where((nb_d > blk)[:, None], new, state)

    out_lanes = np.asarray(state[:, :4])
    return [b"".join(int(lane).to_bytes(8, "little") for lane in row)
            for row in out_lanes]
