"""Log-derivative (LogUp) lookup argument over M31/CM31.

The range-check design (SURVEY §2.1/§2.2): every deferred value decomposes
into chunk_bits-wide chunks which must lie in the table [0, 2^chunk_bits).
On TPU the membership proof is a log-derivative sum check: for a
transcript-drawn challenge beta (in CM31, so soundness ~ |CM31| = p^2),

    sum_i 1 / (beta - w_i)  ==  sum_v m_v / (beta - v)

where w are the looked-up chunk values and m_v counts how often table
value v occurs among them.  Both sides are computed with one batched
inversion (Montgomery trick) — entirely vectorized.

This module provides:
- ``chunk_multiplicities``: m_v histogram of the witness chunks;
- ``logup_sum``: the witness-side sum;
- ``table_sum``: the table-side sum;
- ``prove_range_lookup`` / ``verify_range_lookup``: transcript-bound
  equality of the two sums, plus the partial-sum helper column S with
  S_0 = 0, S_{i+1} = S_i + 1/(beta - w_i) - m_i/(beta - t_i), whose
  telescoping (S_n = 0) is the per-row AIR constraint form
  ((S' - S)(beta - w)(beta - t) = (beta - t) - m (beta - w), degree 3).

This standalone module is the pedagogical/CM31 form; the production
prover runs the same argument IN-CIRCUIT over QM31 challenges inside the
quotient (``constraints.lookup_channels``, enabled by
``prove_trace(range_lookup=True)``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.field_ops import m31_add, m31_batch_inv, m31_mul, m31_sub
from ..ops.ntt import cm31_inv_scalar, cm31_mul_scalar
from ..spec.field import M31_PRIME
from .challenger import Challenger

P = M31_PRIME


def _cm31_batch_inv(ar, ai):
    """Vectorized CM31 inverse via conj/norm with one M31 batch inversion."""
    norm = m31_add(m31_mul(ar, ar), m31_mul(ai, ai))
    ninv = m31_batch_inv(norm)
    return m31_mul(ar, ninv), m31_mul(
        jnp.where(ai == 0, jnp.uint32(0), jnp.uint32(P) - ai), ninv)


def chunk_multiplicities(chunks: np.ndarray, table_size: int) -> np.ndarray:
    """Histogram of witness chunk values over the table domain."""
    return np.bincount(chunks.reshape(-1), minlength=table_size).astype(
        np.uint32)


def logup_sum(values, beta: Tuple[int, int]) -> Tuple[int, int]:
    """sum_i 1/(beta - w_i) over CM31 for M31 witness values (uint32 [n])."""
    vr = jnp.asarray(values, dtype=jnp.uint32)
    dr = jnp.uint32(beta[0]) + (jnp.uint32(P) - vr) % jnp.uint32(P)
    dr = jnp.where(dr >= P, dr - jnp.uint32(P), dr)
    di = jnp.full_like(vr, beta[1])
    ir, ii = _cm31_batch_inv(dr, di)
    sr = int(jnp.sum(ir.astype(jnp.uint64)) % jnp.uint64(P))
    si = int(jnp.sum(ii.astype(jnp.uint64)) % jnp.uint64(P))
    return (sr, si)


def table_sum(multiplicities, beta: Tuple[int, int]) -> Tuple[int, int]:
    """sum_v m_v/(beta - v) over the table [0, len(m))."""
    m = jnp.asarray(multiplicities, dtype=jnp.uint32)
    v = jnp.arange(m.shape[0], dtype=jnp.uint32)
    dr = (jnp.uint32(beta[0]) + jnp.uint32(P) - v) % jnp.uint32(P)
    di = jnp.full_like(v, beta[1])
    ir, ii = _cm31_batch_inv(dr, di)
    tr = m31_mul(m % jnp.uint32(P), ir)
    ti = m31_mul(m % jnp.uint32(P), ii)
    sr = int(jnp.sum(tr.astype(jnp.uint64)) % jnp.uint64(P))
    si = int(jnp.sum(ti.astype(jnp.uint64)) % jnp.uint64(P))
    return (sr, si)


def partial_sums(values, multiplicities, beta: Tuple[int, int]):
    """The helper column S (telescoping partial sums), padded so witness
    and table rows align; S[-1] must equal 0.

    Returns (S as uint32 [steps+1, 2] numpy CM31 pairs).
    """
    w = np.asarray(values, dtype=np.uint32)
    m = np.asarray(multiplicities, dtype=np.uint32)
    steps = max(len(w), len(m))
    s = np.zeros((steps + 1, 2), dtype=np.uint32)
    cur = (0, 0)
    for i in range(steps):
        if i < len(w):
            inv = cm31_inv_scalar(((beta[0] - int(w[i])) % P, beta[1]))
            cur = ((cur[0] + inv[0]) % P, (cur[1] + inv[1]) % P)
        if i < len(m) and m[i]:
            inv = cm31_inv_scalar(((beta[0] - i) % P, beta[1]))
            term = cm31_mul_scalar((int(m[i]) % P, 0), inv)
            cur = ((cur[0] - term[0]) % P, (cur[1] - term[1]) % P)
        s[i + 1] = cur
    return s


def prove_range_lookup(chunks: np.ndarray, chunk_bits: int = 10,
                       challenger: Challenger | None = None) -> Dict[str, Any]:
    """Produce the lookup claim for a set of chunk values."""
    table_size = 1 << chunk_bits
    chunks = np.asarray(chunks, dtype=np.uint32).reshape(-1)
    m = chunk_multiplicities(chunks, table_size)

    challenger = challenger or Challenger()
    challenger.observe(len(chunks))
    challenger.observe_many(int(x) for x in m[: min(64, table_size)])
    beta = challenger.sample_cm31()

    wsum = logup_sum(chunks, beta)
    return {
        "chunk_bits": chunk_bits,
        "n_chunks": int(len(chunks)),
        "multiplicities": [int(x) for x in m],
        "witness_sum": wsum,
    }


def verify_range_lookup(proof: Dict[str, Any], chunks: np.ndarray,
                        challenger: Challenger | None = None) -> bool:
    """Re-derive beta, recompute both sums, check equality.

    (``chunks`` re-supplied here stand in for the committed chunk columns;
    in the integrated prover they come from Merkle-opened trace columns.)
    """
    table_size = 1 << proof["chunk_bits"]
    m = np.asarray(proof["multiplicities"], dtype=np.uint32)
    if len(m) != table_size:
        return False
    chunks = np.asarray(chunks, dtype=np.uint32).reshape(-1)
    if len(chunks) != proof["n_chunks"]:
        return False
    # Multiplicities must actually histogram the chunks (the committed
    # chunk columns are the ground truth).
    if not np.array_equal(chunk_multiplicities(chunks, table_size), m):
        return False
    if np.any(chunks >= table_size):
        return False

    challenger = challenger or Challenger()
    challenger.observe(len(chunks))
    challenger.observe_many(int(x) for x in m[: min(64, table_size)])
    beta = challenger.sample_cm31()

    if tuple(proof["witness_sum"]) != logup_sum(chunks, beta):
        return False
    return tuple(proof["witness_sum"]) == table_sum(m, beta)
