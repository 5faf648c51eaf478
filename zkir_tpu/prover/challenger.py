"""Fiat-Shamir transcript over a Poseidon2-M31 duplex sponge.

Deterministic on both prover and verifier: every observed value (commitment
digests, folded-layer roots, final polynomial) feeds the sponge; challenges
(random field elements, query indices) are squeezed from it.
"""

from __future__ import annotations

from typing import Iterable, List

from ..spec.field import M31_PRIME
from ..ops.poseidon2_ref import RATE, WIDTH, poseidon2_permute


class Challenger:
    def __init__(self):
        self._state = [0] * WIDTH
        self._absorb_buf: List[int] = []
        self._squeeze_buf: List[int] = []

    def observe(self, value: int) -> None:
        self._squeeze_buf.clear()
        self._absorb_buf.append(int(value) % M31_PRIME)
        if len(self._absorb_buf) == RATE:
            self._duplex()

    def observe_many(self, values: Iterable[int]) -> None:
        for v in values:
            self.observe(v)

    def _duplex(self) -> None:
        for i, v in enumerate(self._absorb_buf):
            self._state[i] = (self._state[i] + v) % M31_PRIME
        self._absorb_buf.clear()
        self._state = poseidon2_permute(self._state)
        self._squeeze_buf = list(self._state[:RATE])

    def sample(self) -> int:
        """Squeeze one M31 challenge."""
        if self._absorb_buf or not self._squeeze_buf:
            self._duplex()
        return self._squeeze_buf.pop()

    def sample_cm31(self):
        return (self.sample(), self.sample())

    def sample_bits(self, bits: int) -> int:
        """Uniform integer in [0, 2^bits) (bits <= 30 per draw)."""
        assert bits <= 30
        return self.sample() & ((1 << bits) - 1)
