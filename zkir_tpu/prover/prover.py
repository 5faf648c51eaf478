"""End-to-end trace proof: commitment + batched low-degree argument.

Pipeline (single chip; the sharded variant lives in ``zkir_tpu.parallel``):

1. pad the trace matrix to 2^log_n rows;
2. low-degree-extend every column onto the 2^(log_n + log_blowup) subgroup
   (CM31 NTT — evaluations at stride 2^log_blowup reproduce the trace);
3. commit the extended matrix with one Poseidon2 Merkle tree over rows;
4. draw alpha from the transcript and take the random linear combination
   of columns (the standard batching step);
5. FRI-prove the combination is low degree;
6. for every FRI query, open the committed matrix row pair and let the
   verifier recompute the linear combination, binding FRI layer 0 to the
   trace commitment.

This is the commitment/low-degree core of a Plonky3-style STARK.  The AIR
constraint/quotient composition over these columns is the designated next
stage (the reference contains no prover at all — vm.rs:234-243 only shapes
witness data for one).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..ops import merkle
from ..ops.ntt import cm31_add, cm31_mul, cm31_mul_scalar, lde
from ..spec.field import M31_PRIME
from .challenger import Challenger
from .fri import FriConfig, fri_prove, fri_verify

P = M31_PRIME


def _pad_rows(matrix: np.ndarray):
    n_rows = matrix.shape[0]
    log_n = max((n_rows - 1).bit_length(), 2)
    padded = np.zeros(((1 << log_n), matrix.shape[1]), dtype=np.uint32)
    padded[:n_rows] = matrix
    return padded, log_n


def _combine_columns(ext_r, ext_i, alpha):
    """sum_i alpha^i * col_i over CM31, columns on the leading axis."""
    n_cols = ext_r.shape[0]
    acc = (jnp.zeros_like(ext_r[0]), jnp.zeros_like(ext_i[0]))
    power = (1, 0)
    for c in range(n_cols):
        pr = jnp.uint32(power[0])
        pi = jnp.uint32(power[1])
        term = cm31_mul((ext_r[c], ext_i[c]),
                        (jnp.full_like(ext_r[0], pr),
                         jnp.full_like(ext_i[0], pi)))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)
    return acc


def prove_trace(matrix: np.ndarray,
                fri_config: FriConfig = FriConfig()) -> Dict[str, Any]:
    """Prove knowledge of a committed low-degree trace matrix."""
    padded, log_n = _pad_rows(np.asarray(matrix, dtype=np.uint32))
    n_cols = padded.shape[1]
    log_big = log_n + fri_config.log_blowup

    # LDE all columns at once: [cols, n] -> [cols, N].
    cols_r = jnp.asarray(padded.T)
    cols_i = jnp.zeros_like(cols_r)
    ext_r, ext_i = lde(cols_r, cols_i, log_n, fri_config.log_blowup)

    # Commit the extended matrix (rows interleave re/im parts).
    committed = jnp.concatenate([ext_r.T, ext_i.T], axis=1)  # [N, 2*cols]
    leaves = merkle.hash_rows(committed)
    levels = merkle.build_tree(leaves)
    trace_root = merkle.root(levels)

    challenger = Challenger()
    challenger.observe(log_n)
    challenger.observe(n_cols)
    challenger.observe_many(int(x) for x in trace_root)
    alpha = challenger.sample_cm31()

    comb_r, comb_i = _combine_columns(ext_r, ext_i, alpha)
    fri_proof = fri_prove(comb_r, comb_i, log_big, challenger, fri_config)

    # Open the committed rows referenced by FRI layer 0 (index and its
    # half-domain mirror).
    committed_np = np.asarray(committed)
    openings = []
    half = 1 << (log_big - 1)
    for steps in fri_proof["queries"]:
        leaf_idx = steps[0]["leaf_idx"]
        openings.append({
            "rows": {
                str(j): [int(x) for x in committed_np[j]]
                for j in (leaf_idx, leaf_idx + half)
            },
            "paths": {
                str(j): [
                    [int(x) for x in sib]
                    for sib in merkle.open_path(levels, j)
                ]
                for j in (leaf_idx, leaf_idx + half)
            },
        })

    return {
        "log_n": log_n,
        "n_cols": n_cols,
        "trace_root": [int(x) for x in trace_root],
        "fri": fri_proof,
        "openings": openings,
    }


def verify_trace(proof: Dict[str, Any]) -> bool:
    log_n = proof["log_n"]
    n_cols = proof["n_cols"]
    fri_proof = proof["fri"]
    config: FriConfig = fri_proof["config"]
    log_big = log_n + config.log_blowup
    half = 1 << (log_big - 1)

    challenger = Challenger()
    challenger.observe(log_n)
    challenger.observe(n_cols)
    challenger.observe_many(int(x) for x in proof["trace_root"])
    alpha = challenger.sample_cm31()

    if not fri_verify(fri_proof, challenger):
        return False

    trace_root = np.asarray(proof["trace_root"], dtype=np.uint32)
    for steps_idx, steps in enumerate(fri_proof["queries"]):
        leaf_idx = steps[0]["leaf_idx"]
        opening = proof["openings"][steps_idx]
        for j, value in ((leaf_idx, tuple(steps[0]["lo"])),
                         (leaf_idx + half, tuple(steps[0]["hi"]))):
            row = opening["rows"].get(str(j))
            path = opening["paths"].get(str(j))
            if row is None or path is None or len(row) != 2 * n_cols:
                return False
            digest = np.asarray(merkle.hash_rows(
                jnp.asarray(np.asarray([row], dtype=np.uint32))))[0]
            if not merkle.verify_path(
                trace_root, j, digest,
                [np.asarray(s, dtype=np.uint32) for s in path],
            ):
                return False
            # Recompute the alpha-combination of this row and compare with
            # the FRI layer-0 value.
            acc = (0, 0)
            power = (1, 0)
            for c in range(n_cols):
                col = (row[c], row[n_cols + c])
                term = cm31_mul_scalar(col, power)
                acc = ((acc[0] + term[0]) % P, (acc[1] + term[1]) % P)
                power = cm31_mul_scalar(power, alpha)
            if acc != value:
                return False

    return True
