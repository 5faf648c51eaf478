"""Batched BLAKE3 on device.

The compression function vectorized over N parallel streams (uint32-native
— the TPU-friendly word size).  Chunk chaining and the (left-full) tree
merge are orchestrated host-side with batched device compressions per
level.  Parity oracle: ``zkir_tpu.runtime.crypto.blake3_digest``.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.crypto import (
    _B3_BLOCK_LEN,
    _B3_CHUNK_LEN,
    _B3_CHUNK_END,
    _B3_CHUNK_START,
    _B3_IV,
    _B3_MSG_PERM,
    _B3_PARENT,
    _B3_ROOT,
)

_IV = np.asarray(_B3_IV, dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def _g(state, a, b, c, d, mx, my):
    state[a] = state[a] + state[b] + mx
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = state[a] + state[b] + my
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 7)


def _round_message_orders() -> np.ndarray:
    """Per-round message word order: orders[r][i] = original index of the
    i-th schedule word in round r (the permutation composed r times)."""
    orders = []
    cur = list(range(16))
    for _ in range(7):
        orders.append(list(cur))
        cur = [cur[p] for p in _B3_MSG_PERM]
    return np.asarray(orders, dtype=np.int32)


_ROUND_ORDERS = _round_message_orders()


@jax.jit
def b3_compress_batch(cv, block_words, counter_lo, counter_hi, block_len,
                      flags):
    """Batched compression: cv [N, 8], block_words [N, 16], scalars [N].

    Runs as a lax.scan over the 7 rounds (per-round message order gathered
    from a static table) — the fully-unrolled form trips a pathological
    XLA:CPU behavior, same as SHA-256's (see ops/sha256.py).

    Returns the 8-word output chaining value [N, 8]."""
    n = cv.shape[0]
    iv_rows = jnp.broadcast_to(jnp.asarray(_IV[:4])[None, :], (n, 4))
    state0 = jnp.concatenate(
        [cv, iv_rows,
         jnp.stack([counter_lo, counter_hi, block_len, flags], axis=1)],
        axis=1,
    )  # [N, 16]

    def round_body(state_arr, order):
        m_r = block_words[:, order]  # [N, 16] in this round's order
        state = [state_arr[:, i] for i in range(16)]
        m = [m_r[:, i] for i in range(16)]
        _g(state, 0, 4, 8, 12, m[0], m[1])
        _g(state, 1, 5, 9, 13, m[2], m[3])
        _g(state, 2, 6, 10, 14, m[4], m[5])
        _g(state, 3, 7, 11, 15, m[6], m[7])
        _g(state, 0, 5, 10, 15, m[8], m[9])
        _g(state, 1, 6, 11, 12, m[10], m[11])
        _g(state, 2, 7, 8, 13, m[12], m[13])
        _g(state, 3, 4, 9, 14, m[14], m[15])
        return jnp.stack(state, axis=1), None

    state, _ = jax.lax.scan(round_body, state0, jnp.asarray(_ROUND_ORDERS))
    return state[:, :8] ^ state[:, 8:]


def _chunk_blocks(chunk: bytes):
    blocks = [chunk[i: i + _B3_BLOCK_LEN]
              for i in range(0, max(len(chunk), 1), _B3_BLOCK_LEN)] or [b""]
    return blocks


def _words(block: bytes) -> np.ndarray:
    padded = block + b"\x00" * (_B3_BLOCK_LEN - len(block))
    return np.frombuffer(padded, dtype="<u4")


def blake3_many(messages: List[bytes]) -> List[bytes]:
    """BLAKE3-256 of a batch of byte strings.

    All chunk chains advance in lockstep on device (block-by-block,
    masked for shorter chunks); tree merges run as batched parent
    compressions per level.
    """
    n = len(messages)
    # Decompose every message into chunks; flatten all chunks into one
    # batch whose blocks advance together.
    chunk_owner: List[int] = []
    chunk_counter: List[int] = []
    chunk_data: List[bytes] = []
    for i, msg in enumerate(messages):
        chunks = [msg[j: j + _B3_CHUNK_LEN]
                  for j in range(0, max(len(msg), 1), _B3_CHUNK_LEN)] or [b""]
        for k, chunk in enumerate(chunks):
            chunk_owner.append(i)
            chunk_counter.append(k)
            chunk_data.append(chunk)

    total = len(chunk_data)
    per_chunk_blocks = [_chunk_blocks(c) for c in chunk_data]
    max_blocks = max(len(b) for b in per_chunk_blocks)

    block_arr = np.zeros((total, max_blocks, 16), dtype=np.uint32)
    block_len = np.zeros((total, max_blocks), dtype=np.uint32)
    block_flags = np.zeros((total, max_blocks), dtype=np.uint32)
    n_blocks = np.zeros(total, dtype=np.int32)
    for t, blocks in enumerate(per_chunk_blocks):
        n_blocks[t] = len(blocks)
        for b, block in enumerate(blocks):
            block_arr[t, b] = _words(block)
            block_len[t, b] = len(block)
            flags = 0
            if b == 0:
                flags |= _B3_CHUNK_START
            if b == len(blocks) - 1:
                flags |= _B3_CHUNK_END
            block_flags[t, b] = flags

    # Chunks that are sole-chunk roots get ROOT on their last block; handled
    # at finalization (single-chunk messages) — leave flags as-is here and
    # recompress the root output separately, matching the oracle structure.
    owner = np.asarray(chunk_owner)
    counters = np.asarray(chunk_counter, dtype=np.uint64)

    cv = jnp.tile(jnp.asarray(_IV)[None, :], (total, 1))
    ctr_lo = jnp.asarray((counters & 0xFFFFFFFF).astype(np.uint32))
    ctr_hi = jnp.asarray((counters >> 32).astype(np.uint32))

    # Distinguish the FINAL block (kept un-finalized for possible ROOT) —
    # compress all non-final blocks first.
    for b in range(max_blocks):
        is_final = (n_blocks - 1) == b
        new_cv = b3_compress_batch(
            cv, jnp.asarray(block_arr[:, b]), ctr_lo, ctr_hi,
            jnp.asarray(block_len[:, b]), jnp.asarray(block_flags[:, b]))
        advance = jnp.asarray((~is_final) & (b < n_blocks))
        cv = jnp.where(advance[:, None], new_cv, cv)

    # Per-chunk pending output: (cv, last block words/len/flags, counter).
    last_idx = n_blocks - 1
    last_words = block_arr[np.arange(total), last_idx]
    last_len = block_len[np.arange(total), last_idx]
    last_flags = block_flags[np.arange(total), last_idx]

    # Build per-message output lists.
    out: List[bytes] = [b""] * n
    cv_np = np.asarray(cv)

    for i in range(n):
        mine = np.nonzero(owner == i)[0]
        # Pending outputs for this message's chunks, in order.
        pend = [
            (cv_np[t], last_words[t], int(last_len[t]), int(last_flags[t]),
             int(counters[t]))
            for t in mine
        ]
        while len(pend) > 1:
            merged = []
            for j in range(0, len(pend) - 1, 2):
                lcv = _finalize_one(*pend[j])
                rcv = _finalize_one(*pend[j + 1])
                parent_words = np.concatenate([lcv, rcv]).astype(np.uint32)
                merged.append((_IV.copy(), parent_words, _B3_BLOCK_LEN,
                               _B3_PARENT, 0))
            if len(pend) % 2 == 1:
                merged.append(pend[-1])
            pend = merged
        cv0, words0, blen0, flags0, ctr0 = pend[0]
        root = _finalize_one(cv0, words0, blen0, flags0 | _B3_ROOT, ctr0)
        out[i] = b"".join(int(w).to_bytes(4, "little") for w in root)
    return out


def _finalize_one(cv, words, block_len, flags, counter):
    res = b3_compress_batch(
        jnp.asarray(np.asarray(cv, dtype=np.uint32))[None, :],
        jnp.asarray(np.asarray(words, dtype=np.uint32))[None, :],
        jnp.asarray(np.asarray([counter & 0xFFFFFFFF], dtype=np.uint32)),
        jnp.asarray(np.asarray([counter >> 32], dtype=np.uint32)),
        jnp.asarray(np.asarray([block_len], dtype=np.uint32)),
        jnp.asarray(np.asarray([flags], dtype=np.uint32)),
    )
    return np.asarray(res)[0]
