"""Batched SHA-256 on device (jnp, uint32-native).

The crypto syscall's hot path: thousands of independent hashes advance in
lockstep, one compression round at a time, across the whole batch — pure
uint32 rotate/add/xor, exactly the VPU's diet.  Scalar parity oracle:
``zkir_tpu.runtime.crypto`` (reference crypto.rs:24-207); digests verified
against hashlib.

Also provides the streaming init/update/finalize surface
(``Sha256Stream``) over batches of equal-progress streams.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.crypto import SHA256_H0, SHA256_K, sha256_pad

_K = np.asarray(SHA256_K, dtype=np.uint32)
_H0 = np.asarray(SHA256_H0, dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


@jax.jit
def sha256_compress_batch(blocks, states):
    """One compression: blocks uint32 [N, 16], states [N, 8] -> [N, 8].

    Optionally returns per-round witness states when traced via
    ``sha256_compress_batch_with_witness``.
    """
    out, _ = _compress(blocks, states, collect=False)
    return out


def _compress(blocks, states, collect: bool):
    """Scan over the 64 rounds with a 16-word shift-register schedule.

    The message-schedule extension and the compression round run in the
    same loop: the shift register holds w[i..i+15], so w[i] is its head,
    and each step appends w[i+16] (values computed past w[63] are unused).
    One lax.scan keeps the XLA graph small (the fully-unrolled form
    compiles pathologically on XLA:CPU).
    """
    k = jnp.asarray(_K)

    def round_body(carry, i):
        window, a, b, c, d, e, f, g, h = carry
        w_i = window[:, 0]
        big_s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + big_s1 + ch + k[i] + w_i
        big_s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = big_s0 + maj
        h, g, f = g, f, e
        e = d + t1
        d, c, b = c, b, a
        a = t1 + t2
        # Extend the schedule: w[i+16] from w[i+1], w[i+9], w[i+14], w[i].
        s0 = (_rotr(window[:, 1], 7) ^ _rotr(window[:, 1], 18)
              ^ (window[:, 1] >> 3))
        s1 = (_rotr(window[:, 14], 17) ^ _rotr(window[:, 14], 19)
              ^ (window[:, 14] >> 10))
        new_w = window[:, 0] + s0 + window[:, 9] + s1
        window = jnp.concatenate([window[:, 1:], new_w[:, None]], axis=1)
        carry = (window, a, b, c, d, e, f, g, h)
        y = jnp.stack([a, b, c, d, e, f, g, h], axis=1) if collect \
            else jnp.zeros((0,), dtype=jnp.uint32)
        return carry, y

    init = (blocks,) + tuple(states[:, i] for i in range(8))
    carry, ys = jax.lax.scan(round_body, init, jnp.arange(64))
    _, a, b, c, d, e, f, g, h = carry
    final = jnp.stack([a, b, c, d, e, f, g, h], axis=1) + states
    witness = jnp.transpose(ys, (1, 0, 2)) if collect else None
    return final, witness


@jax.jit
def sha256_compress_batch_with_witness(blocks, states):
    """Compression emitting the full 64-round witness [N, 64, 8] — the
    round-state columns of the AIR crypto table (reference
    zkir-spec/src/trace.rs:236-285)."""
    return _compress(blocks, states, collect=True)


def sha256_many(messages: List[bytes]) -> np.ndarray:
    """Hash a batch of byte strings; returns digests as uint32 [N, 8].

    Messages are padded host-side; device compressions advance all streams
    one block at a time (shorter messages finish with masked updates).
    """
    n = len(messages)
    padded = [sha256_pad(m) for m in messages]
    max_blocks = max(len(p) // 64 for p in padded)

    block_arr = np.zeros((n, max_blocks, 16), dtype=np.uint32)
    n_blocks = np.zeros(n, dtype=np.int32)
    for i, p in enumerate(padded):
        nb = len(p) // 64
        n_blocks[i] = nb
        words = np.frombuffer(p, dtype=">u4").reshape(nb, 16)
        block_arr[i, :nb] = words

    states = jnp.tile(jnp.asarray(_H0)[None, :], (n, 1))
    blocks_d = jnp.asarray(block_arr)
    n_blocks_d = jnp.asarray(n_blocks)
    for blk in range(max_blocks):
        new = sha256_compress_batch(blocks_d[:, blk], states)
        active = (n_blocks_d > blk)[:, None]
        states = jnp.where(active, new, states)
    return np.asarray(states)


def digests_to_bytes(digests: np.ndarray) -> List[bytes]:
    return [b"".join(int(w).to_bytes(4, "big") for w in row)
            for row in digests]


class Sha256Stream:
    """Batched streaming SHA-256 (init/update/finalize) over N parallel
    streams that advance together."""

    def __init__(self, n: int):
        self.n = n
        self.states = jnp.tile(jnp.asarray(_H0)[None, :], (n, 1))
        self.buffers: List[bytearray] = [bytearray() for _ in range(n)]
        self.lengths = [0] * n

    def update(self, chunks: List[bytes]) -> None:
        assert len(chunks) == self.n
        for i, chunk in enumerate(chunks):
            self.buffers[i] += chunk
            self.lengths[i] += len(chunk)
        # Compress any full 64-byte blocks (all streams step together up to
        # the minimum number of complete blocks; stragglers buffer).
        while min(len(b) for b in self.buffers) >= 64:
            block = np.zeros((self.n, 16), dtype=np.uint32)
            for i, buf in enumerate(self.buffers):
                block[i] = np.frombuffer(bytes(buf[:64]), dtype=">u4")
                del buf[:64]
            self.states = sha256_compress_batch(jnp.asarray(block),
                                                self.states)

    def finalize(self) -> List[bytes]:
        # Per-stream tail: pad and run the remaining block(s).
        states = np.asarray(self.states)
        out: List[bytes] = []
        tails = []
        max_tail_blocks = 0
        for i, buf in enumerate(self.buffers):
            tail = bytearray(buf)
            tail.append(0x80)
            while len(tail) % 64 != 56:
                tail.append(0)
            tail += (self.lengths[i] * 8).to_bytes(8, "big")
            tails.append(bytes(tail))
            max_tail_blocks = max(max_tail_blocks, len(tail) // 64)

        cur = jnp.asarray(states)
        blocks = np.zeros((self.n, max_tail_blocks, 16), dtype=np.uint32)
        nb = np.zeros(self.n, dtype=np.int32)
        for i, tail in enumerate(tails):
            k = len(tail) // 64
            nb[i] = k
            blocks[i, :k] = np.frombuffer(tail, dtype=">u4").reshape(k, 16)
        blocks_d = jnp.asarray(blocks)
        nb_d = jnp.asarray(nb)
        for blk in range(max_tail_blocks):
            new = sha256_compress_batch(blocks_d[:, blk], cur)
            cur = jnp.where((nb_d > blk)[:, None], new, cur)
        final = np.asarray(cur)
        for row in final:
            out.append(b"".join(int(w).to_bytes(4, "big") for w in row))
        return out
