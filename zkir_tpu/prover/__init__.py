"""Plonky3-style commitment and proof pipeline.

The reference produces witness data shaped for a downstream AIR prover that
it does not contain (``zkir-runtime/src/vm.rs:234-243`` names it; nothing in
the repo implements it).  This package provides that missing stage,
TPU-first:

- ``challenger`` — Poseidon2-sponge Fiat-Shamir transcript.
- ``trace``      — execution-trace columns -> M31 AIR trace matrix.
- ``fri``        — FRI low-degree commitment over the CM31 NTT domain.
- ``prover``     — end-to-end trace commitment + FRI proof + verification.
"""

from .challenger import Challenger
from .fri import FriConfig, fri_prove, fri_verify
from .prover import preprocess_program, prove_trace, verify_trace
from .trace import trace_to_matrix
