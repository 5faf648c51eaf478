"""End-to-end STARK-style trace proof: commitment + constraints + FRI.

Pipeline (single chip; distributed kernels live in ``zkir_tpu.parallel``):

1. pad the trace matrix to 2^log_n rows;
2. low-degree-extend every column onto a *coset* of the larger subgroup
   (CM31 NTT; the coset keeps the trace-domain vanishing polynomial
   invertible at every committed point);
3. commit the extended matrix with a Poseidon2 Merkle tree (root_1);
4. draw the constraint combiner alpha_c and evaluate the AIR quotient
   Q = sum alpha_c^j C_j / D_j on the coset (``prover.constraints``);
5. commit Q with a second tree (root_2);
6. draw the batch combiner alpha_b; FRI-prove the combined polynomial
   sum alpha_b^i col_i + alpha_b^{n_cols} Q is low degree;
7. for every FRI query index k open both trees at k, k+half and their
   next-row rotations — the verifier recomputes the batch combination
   (binding FRI to the commitments) AND re-evaluates the constraints,
   checking Q at the opened points.

The reference contains no prover at all (vm.rs:234-243 shapes witness data
for an absent Plonky3-style consumer); this module is that missing stage.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import merkle
from ..ops.ntt import (
    _find_generator,
    cm31_add,
    cm31_mul,
    cm31_mul_scalar,
    cm31_pow_scalar,
    coset_intt,
    coset_ntt,
    lde,
    root_of_unity,
)
from ..spec.field import M31_PRIME
from .challenger import Challenger
from .aux_table import N_AUX_COLS, preprocess_aux
from .constraints import (NUM_AUX, NUM_LOOKUP, quotient_evals,
                          quotient_value_at)
from .fri import FriConfig, fri_prove, fri_verify

P = M31_PRIME


class ConstraintViolation(Exception):
    """The trace fed to ``prove_trace`` violates the AIR.

    Raised by the prove-time completeness self-check (the high quotient
    coefficients that chunking would discard are nonzero), with the
    violated constraint term(s) and row(s) named.  Without this check a
    bad trace — or a wrong constraint — produces a "proof" that fails
    only at the verifier."""


def _coset_shift() -> Tuple[int, int]:
    """A point outside every 2-power subgroup: the full-group generator."""
    return _find_generator()


def _pad_rows(matrix: np.ndarray, min_log: int = 2):
    """Pad to 2^log_n rows with EBREAK rows ("a halted machine keeps
    halting"): opcode 0x51, valid one-hot selector blocks, and the final
    row's register file replicated — so the decode, is_seq-lookup,
    register-write-consistency and result-binding constraints all hold
    on padding.

    Requires the final real row to be a halt (EBREAK/ECALL): the
    post-state of a final *writing* row is unobservable, and a final
    branch/jump row has no successor pc, so either would violate an
    honest trace's result-binding / pc-target constraints."""
    from .constraints import (
        COL_CEQ, COL_CLK, COL_OPCODE, COL_RD1H0, COL_REG_LO, COL_RIDX,
        COL_RS1H0, COL_RS2H0, COL_SEL0, COL_SH_D0, COL_SH_PM, COL_SH_Z,
        COL_WIDX, OP_VALUES)
    from .trace import COL_CIDX, COL_CNA0

    n_rows = matrix.shape[0]
    if n_rows > 0 and int(matrix[-1, COL_OPCODE]) not in (0x50, 0x51):
        raise ValueError(
            "trace must end in a halt (ECALL/EBREAK) row; got opcode "
            f"{int(matrix[-1, COL_OPCODE]):#x}")
    if n_rows > 0 and int(matrix[-1, COL_OPCODE]) == 0x50:
        # The halt-chain AIR requires a final ECALL to be EXIT (r10 == 0):
        # non-exit ECALLs advance pc by 4 into a successor row.
        r10 = (int(matrix[-1, COL_REG_LO + 10])
               + (int(matrix[-1, COL_REG_LO + 26]) << 20))
        if r10 != 0:
            raise ValueError(
                "trace must end in a halt: final ECALL row has r10 = "
                f"{r10:#x} (not EXIT)")
    log_n = max((n_rows - 1).bit_length(), min_log)
    padded = np.zeros(((1 << log_n), matrix.shape[1]), dtype=np.uint32)
    padded[:n_rows] = matrix
    if (1 << log_n) > n_rows and n_rows > 0:
        padded[n_rows:, COL_OPCODE] = 0x51
        padded[n_rows:, COL_SEL0 + OP_VALUES.index(0x51)] = 1
        padded[n_rows:, COL_RD1H0] = 1          # rd field 0 -> e_0
        padded[n_rows:, COL_RS1H0] = 1
        padded[n_rows:, COL_RS2H0] = 1
        padded[n_rows:, COL_REG_LO:COL_REG_LO + 32] = \
            matrix[-1, COL_REG_LO:COL_REG_LO + 32]
        # The exec clk chain (clk' = clk + 1) runs through padding.
        padded[n_rows:, COL_CLK] = np.arange(n_rows, 1 << log_n,
                                             dtype=np.uint32)
        # The io tape-index chains run through padding unchanged (the
        # final real row is a halt, so erd = ewr = 0 there and on every
        # EBREAK padding row).
        padded[n_rows:, COL_RIDX] = matrix[-1, COL_RIDX]
        padded[n_rows:, COL_WIDX] = matrix[-1, COL_WIDX]
        padded[n_rows:, COL_CEQ] = 1    # eq gadget: cu = 0 on padding
        padded[n_rows:, COL_SH_Z] = 1   # shq = 0 on padding
        padded[n_rows:, COL_SH_D0] = 1  # shift-table row 0: (0, 0, 1)
        padded[n_rows:, COL_SH_PM] = 1
        padded[n_rows:, COL_CNA0] = 1   # crypto block: nc = 0 one-hot
        padded[n_rows:, COL_CIDX] = matrix[-1, COL_CIDX]
    return padded, log_n


def _initial_cells(program):
    """{cell_index: 64-bit LE value} of the public program's code+data
    segments (the machine's nonzero initial memory)."""
    from ..spec.memlayout import CODE_BASE

    if program is None:
        return {}
    image = bytearray()
    for w in program.code:
        image += int(w).to_bytes(4, "little")
    image += bytes(program.data)
    cells = {}
    for cell_base in range(CODE_BASE & ~7, CODE_BASE + len(image), 8):
        value = 0
        for j in range(8):
            a = cell_base + j - CODE_BASE
            if 0 <= a < len(image):
                value |= image[a] << (8 * j)
        if value:
            cells[cell_base >> 3] = value
    return cells


def _build_memory_table(padded: np.ndarray, n_real: int,
                        program=None) -> None:
    """Fill the (cell, ts)-sorted memory UPDATE table (trace.py
    M_BASE..M_BASE+25) in place: one row per load/store exec row (any
    width) carrying (cell key, 2*clk + 2, old cell bytes, new cell
    bytes); per crypto-syscall row, one read row per input cell at
    2*clk + 1 (bytes unchanged) and 4 digest-write rows at 2*clk + 2;
    plus one ts-0 init row per nonzero code/data cell of the public
    program, sorted by (addr_hi, q, ts); padding rows continue the last
    cell's run as no-op updates (old = new = last bytes, ts advancing).
    Gap chunks cha/chb/chc (3 x 10 bits -> gaps < 2^30) witness the
    strict increase of ts within a run and of the cell key between
    runs."""
    from .constraints import (COL_CLK, COL_MEM_ADDR_HI, COL_MQA, COL_MQB,
                              COL_NB0, COL_OB0, COL_OPCODE, LOAD_OPS,
                              M_AHI, M_CHA, M_CHB, M_CHC, M_CLK, M_HIEQ,
                              M_NB0, M_OB0, M_QA, M_QB, M_REAL, M_SAME,
                              STORE_OPS)
    from .trace import (COL_CBLK, COL_CMORE, COL_CNA0, COL_CRB0,
                        COL_CWD0, COL_CWO0, COL_ECR, N_WRITE_SLOTS)

    n = padded.shape[0]
    op = padded[:n_real, COL_OPCODE]
    rows = np.nonzero(np.isin(op, LOAD_OPS + STORE_OPS))[0]
    init = _initial_cells(program)
    crows = np.nonzero(padded[:n_real, COL_ECR])[0]
    crypto_rows = []     # (q, ahi, ts, ob[8], nb[8]) per slot row
    for r in crows:
        nc = int(np.nonzero(padded[r, COL_CNA0:COL_CNA0 + 8])[0][0])
        clk = int(padded[r, COL_CLK])
        cblk = int(padded[r, COL_CBLK])
        more = int(padded[r, COL_CMORE])
        r11 = (int(padded[r, 8 + 11]) + (int(padded[r, 24 + 11]) << 20))
        r13 = (int(padded[r, 8 + 13]) + (int(padded[r, 24 + 13]) << 20))
        for s in range(nc):
            cell = (r11 >> 3) + 7 * cblk + s
            b = [int(padded[r, COL_CRB0 + 8 * s + j]) for j in range(8)]
            crypto_rows.append((cell & 0x1FFFF, cell >> 17,
                                2 * clk + 1, b, b))
        if more:
            continue        # digest writes fire on the final chunk only
        for s in range(N_WRITE_SLOTS):
            cell = (r13 >> 3) + s
            ob = [int(padded[r, COL_CWO0 + 8 * s + j]) for j in range(8)]
            nb = [int(padded[r, COL_CWD0 + 8 * s + j]) for j in range(8)]
            crypto_rows.append((cell & 0x1FFFF, cell >> 17,
                                2 * clk + 2, ob, nb))
    k = len(rows) + len(init) + len(crypto_rows)
    if k > n:
        raise ValueError(
            f"memory table needs {k} rows (exec memory ops + crypto "
            f"slots + program init cells) but the padded trace has only "
            f"{n}; re-prove with a larger padding size")

    t_q = np.zeros(n, dtype=np.int64)
    t_ah = np.zeros(n, dtype=np.int64)
    t_clk = np.zeros(n, dtype=np.int64)
    t_ob = np.zeros((n, 8), dtype=np.uint32)
    t_nb = np.zeros((n, 8), dtype=np.uint32)
    ke = len(rows)
    if ke:
        t_q[:ke] = (padded[rows, COL_MQA].astype(np.int64)
                    + (padded[rows, COL_MQB].astype(np.int64) << 10))
        t_ah[:ke] = padded[rows, COL_MEM_ADDR_HI].astype(np.int64)
        t_clk[:ke] = 2 * padded[rows, COL_CLK].astype(np.int64) + 2
        for j in range(8):
            t_ob[:ke, j] = padded[rows, COL_OB0 + j]
            t_nb[:ke, j] = padded[rows, COL_NB0 + j]
    for i, (cq, cah, ts, ob, nb) in enumerate(crypto_rows):
        r = ke + i
        t_q[r], t_ah[r], t_clk[r] = cq, cah, ts
        for j in range(8):
            t_ob[r, j] = ob[j]
            t_nb[r, j] = nb[j]
    ke += len(crypto_rows)
    for i, (cell, value) in enumerate(sorted(init.items())):
        r = ke + i
        t_q[r] = cell & 0x1FFFF
        t_ah[r] = cell >> 17
        t_clk[r] = 0
        for j in range(8):
            t_nb[r, j] = (value >> (8 * j)) & 0xFF
    if k:
        order = np.lexsort((t_clk[:k], t_q[:k], t_ah[:k]))
        t_q[:k], t_ah[:k], t_clk[:k] = (t_q[:k][order], t_ah[:k][order],
                                        t_clk[:k][order])
        t_ob[:k] = t_ob[:k][order]
        t_nb[:k] = t_nb[:k][order]
        # padding: continue the last run with no-op updates
        t_q[k:], t_ah[k:] = t_q[k - 1], t_ah[k - 1]
        t_clk[k:] = t_clk[k - 1] + np.arange(1, n - k + 1)
        t_ob[k:] = t_nb[k - 1]
        t_nb[k:] = t_nb[k - 1]
    else:
        t_clk[:] = np.arange(n)
    same = np.zeros(n, dtype=np.uint32)
    hieq = np.zeros(n, dtype=np.uint32)
    same[1:] = ((t_q[1:] == t_q[:-1]) & (t_ah[1:] == t_ah[:-1])) \
        .astype(np.uint32)
    hieq[1:] = (t_ah[1:] == t_ah[:-1]).astype(np.uint32)
    gap = np.zeros(n, dtype=np.int64)
    gap[1:] = np.where(
        same[1:] == 1, t_clk[1:] - t_clk[:-1] - 1,
        np.where(hieq[1:] == 1, t_q[1:] - t_q[:-1] - 1,
                 t_ah[1:] - t_ah[:-1] - 1))
    if k and not ((gap[1:] >= 0).all() and (gap[1:] < 1 << 30).all()):
        at = int(np.nonzero((gap[1:] < 0) | (gap[1:] >= 1 << 30))[0][0]) + 1
        raise ValueError(
            "memory-consistency completeness limit: the gap between "
            f"consecutive sorted-table rows {at - 1} and {at} "
            f"(cell {int(t_ah[at]):#x}:{int(t_q[at]):#x}, clk "
            f"{int(t_clk[at])}) exceeds the 30-bit gap-chunk budget.  "
            "Two accesses to the same cell must be < 2^30 rows apart "
            "(insert a refresh load, or split the trace); cell runs "
            "must start < 2^30 above the previous run's key limb")
    padded[:, M_QA] = (t_q & 1023).astype(np.uint32)
    padded[:, M_QB] = (t_q >> 10).astype(np.uint32)
    padded[:, M_AHI] = t_ah.astype(np.uint32)
    padded[:, M_CLK] = t_clk.astype(np.uint32)
    for j in range(8):
        padded[:, M_OB0 + j] = t_ob[:, j]
        padded[:, M_NB0 + j] = t_nb[:, j]
    padded[:, M_REAL] = (np.arange(n) < k).astype(np.uint32)
    padded[:, M_SAME], padded[:, M_HIEQ] = same, hieq
    padded[:, M_CHA] = (gap & 1023).astype(np.uint32)
    padded[:, M_CHB] = ((gap >> 10) & 1023).astype(np.uint32)
    padded[:, M_CHC] = (gap >> 20).astype(np.uint32)


# ----------------------------------------------------------------------
# Device-side (jnp) QM31 LogUp helpers.  Round 3 computed every partial
# sum with host numpy (lexsort/cumsum/bincount serialized on the host and
# round-tripped the trace over the TPU link per prove); these run the
# compress -> batch-invert -> prefix-sum pipeline as a handful of jitted
# device ops, in QM31 (challenges from the degree-4 extension).
# ----------------------------------------------------------------------


def _delta_compress_dev(components, delta):
    """sum_k comp_k * delta^k over QM31 for a list of M31-valued jnp
    vectors (delta a host QM31 4-tuple).  Returns a QM31 4-tuple."""
    from ..ops.field_ops import m31_add as ja, m31_mul as jm
    from ..ops.qm31 import qm31_mul_scalar

    c0 = jnp.asarray(components[0], jnp.uint32)
    acc = [c0, jnp.zeros_like(c0), jnp.zeros_like(c0), jnp.zeros_like(c0)]
    pw = delta
    for c in components[1:]:
        cj = jnp.asarray(c, jnp.uint32)
        for k in range(4):
            if pw[k] % P:
                acc[k] = ja(acc[k], jm(cj, jnp.uint32(pw[k] % P)))
        pw = qm31_mul_scalar(pw, delta)
    return tuple(acc)


def _beta_minus_compress_np(components, beta, delta):
    """(beta - sum_k comp_k delta^k) as a host uint32 [4, ...] array.

    Host numpy: the compression is a cheap elementwise pass over a few
    dozen component vectors — one uint64 multiply-accumulate each —
    while the heavy field work (batched Fermat inversion, prefix sums)
    stays in the jitted device kernels.  One transfer, one dispatch per
    channel group instead of hundreds of eager device ops (the warm
    TPU prove spent ~half its wall clock dispatching these)."""
    from ..ops.qm31 import qm31_mul_scalar

    c0 = np.asarray(components[0], dtype=np.uint64) % P
    acc = [c0.copy(), np.zeros_like(c0), np.zeros_like(c0),
           np.zeros_like(c0)]
    pw = delta
    for c in components[1:]:
        cj = np.asarray(c, dtype=np.uint64) % P
        for k in range(4):
            if pw[k] % P:
                acc[k] = (acc[k] + cj * (pw[k] % P)) % P
        pw = qm31_mul_scalar(pw, delta)
    return np.stack([((beta[k] - acc[k].astype(np.int64)) % P)
                     .astype(np.uint32) for k in range(4)])


def _beta_minus(beta, w4):
    """beta - w for a host QM31 beta and QM31 vector w."""
    from ..ops.field_ops import m31_sub as js

    return tuple(js(jnp.full_like(w4[k], beta[k] % P), w4[k])
                 for k in range(4))


def _qscale_m31(x4, m):
    """QM31 vector times an M31-valued jnp vector (componentwise)."""
    from ..ops.field_ops import m31_mul as jm

    return tuple(jm(c, m) for c in x4)


def _exclusive_cumsum4(term4):
    """Exclusive prefix sums mod p along the last axis, per component.

    int64 cumsum is exact for < 2^33 terms (each < 2^31)."""
    out = []
    for c in term4:
        cum = jnp.cumsum(c.astype(jnp.int64), axis=-1) % P
        s = jnp.zeros_like(cum)
        s = s.at[..., 1:].set(cum[..., :-1])
        out.append(s.astype(jnp.uint32))
    return tuple(out)


@jax.jit
def _masked_inv_kernel(bw4, mask):
    """mask / bw over QM31 (batched inversion, one dispatch)."""
    from ..ops.qm31 import qm31_batch_inv

    return _qscale_m31(qm31_batch_inv(bw4), mask)


@jax.jit
def _exclusive_cumsum4_jit(term4):
    return _exclusive_cumsum4(term4)


@jax.jit
def _qm31_inv_sum_kernel(w4):
    """sum_j 1/w_j over QM31 for a 4-tuple of [m] vectors (one device
    round trip for the public demand computations)."""
    from ..ops.qm31 import qm31_batch_inv

    inv = qm31_batch_inv(w4)
    return tuple(jnp.sum(c.astype(jnp.int64)) % P for c in inv)


def _mem_tuple_components(padded: np.ndarray):
    """(exec components [19, n], table components [19, n]) of the memory
    update tuples: (q, addr_hi, ts = 2*clk + 2, ob0-7, nb0-7)."""
    from .constraints import (COL_CLK, COL_MEM_ADDR_HI, COL_MQA, COL_MQB,
                              COL_NB0, COL_OB0, M_AHI, M_CLK, M_NB0,
                              M_OB0, M_QA, M_QB)

    q_e = (padded[:, COL_MQA].astype(np.uint64)
           + (padded[:, COL_MQB].astype(np.uint64) << 10))
    w = [q_e, padded[:, COL_MEM_ADDR_HI].astype(np.uint64),
         2 * padded[:, COL_CLK].astype(np.uint64) + 2]
    w += [padded[:, COL_OB0 + j].astype(np.uint64) for j in range(8)]
    w += [padded[:, COL_NB0 + j].astype(np.uint64) for j in range(8)]
    q_t = (padded[:, M_QA].astype(np.uint64)
           + (padded[:, M_QB].astype(np.uint64) << 10))
    t = [q_t, padded[:, M_AHI].astype(np.uint64),
         padded[:, M_CLK].astype(np.uint64)]
    t += [padded[:, M_OB0 + j].astype(np.uint64) for j in range(8)]
    t += [padded[:, M_NB0 + j].astype(np.uint64) for j in range(8)]
    return w, t


def memory_init_demand(program, beta, delta):
    """The verifier-computable init-demand scalar: sum over the public
    program's nonzero code/data cells of 1/(beta - compress(cell tuple))
    where the tuple is (q, addr_hi, clk=0, old bytes=0, new bytes=cell
    bytes) — the clk-0 init rows the prover placed in the table.
    Returns a QM31 4-tuple; zero when there is no program."""
    init = _initial_cells(program)
    if not init:
        return (0, 0, 0, 0)
    cells = sorted(init.items())
    m = len(cells)
    comp = [np.zeros(m, dtype=np.uint32) for _ in range(19)]
    for i, (cell, value) in enumerate(cells):
        comp[0][i] = cell & 0x1FFFF
        comp[1][i] = cell >> 17
        for j in range(8):
            comp[11 + j][i] = (value >> (8 * j)) & 0xFF
    bw = _beta_minus_compress_np(comp, beta, delta)
    out = _qm31_inv_sum_kernel(tuple(jnp.asarray(r) for r in bw))
    return tuple(int(x) for x in out)


@jax.jit
def _memory_partial_sum_kernel(w4, t4, v, real):
    from ..ops.qm31 import qm31_batch_inv, qm31_sub

    n = v.shape[0]
    stacked = tuple(jnp.concatenate([w4[k], t4[k]]) for k in range(4))
    inv = qm31_batch_inv(stacked)
    inv_w = tuple(c[:n] for c in inv)
    inv_t = tuple(c[n:] for c in inv)
    term = qm31_sub(_qscale_m31(inv_w, v), _qscale_m31(inv_t, real))
    return _exclusive_cumsum4(term), term


def _memory_partial_sum(padded: np.ndarray, beta, delta):
    """The memory-update multiset partial-sum column (QM31 4-tuple [n]):

    s[0] = 0; s[i+1] = s[i] + v_i/(beta - w_i) - real_i/(beta - t_i)

    where w/t delta-compress the 19-component exec-row and table update
    tuples; the telescope closes against -d_init at the last row
    (boundary constraint, constraints.memory_multiset)."""
    from .constraints import COL_OPCODE, LOAD_OPS, M_REAL, STORE_OPS

    w_comp, t_comp = _mem_tuple_components(padded)
    w4 = tuple(jnp.asarray(r) for r in
               _beta_minus_compress_np(w_comp, beta, delta))
    t4 = tuple(jnp.asarray(r) for r in
               _beta_minus_compress_np(t_comp, beta, delta))
    op = padded[:, COL_OPCODE]
    v = jnp.asarray(np.isin(op, LOAD_OPS + STORE_OPS).astype(np.uint32))
    real = jnp.asarray(padded[:, M_REAL])
    # S (partial sums, exclusive) and F (the per-row terms, their own
    # committed column so the boundary constraints stay degree <= 1).
    return _memory_partial_sum_kernel(w4, t4, v, real)


def _observe_io(challenger, inputs, outputs) -> None:
    """Feed the claimed I/O tapes into the Fiat-Shamir transcript
    (identically on prover and verifier)."""
    challenger.observe(len(inputs))
    for v in inputs:
        challenger.observe(v & 0xFFFFF)
        challenger.observe((v >> 20) & 0xFFFFF)
    challenger.observe(len(outputs))
    for v in outputs:
        challenger.observe(v & 0xFFFFF)
        challenger.observe((v >> 20) & 0xFFFFF)


def extract_io(matrix: np.ndarray):
    """The claimed public I/O tapes read off a trace matrix: (inputs
    consumed, outputs written), each a list of 40-bit ints in tape
    order.  ``inputs`` is the CONSUMED read sequence — reads past the
    provided tape's end appear as trailing zeros (syscall.rs:54-62)."""
    op = matrix[:, 2]
    r10 = (matrix[:, 8 + 10].astype(np.uint64)
           + (matrix[:, 24 + 10].astype(np.uint64) << 20))
    r11 = (matrix[:, 8 + 11].astype(np.uint64)
           + (matrix[:, 24 + 11].astype(np.uint64) << 20))
    is_ec = op == 0x50
    rd_rows = np.nonzero(is_ec & (r10 == 1))[0]
    wr_rows = np.nonzero(is_ec & (r10 == 2))[0]
    inputs = [int(r10[i + 1]) for i in rd_rows]   # next-row R10 = result
    outputs = [int(r11[i]) for i in wr_rows]
    return inputs, outputs


def io_tape_demand(inputs, outputs, beta, delta):
    """The verifier-computable I/O demand: sum over the claimed tapes of
    1/(beta - (tag + idx*delta + lo*delta^2 + hi*delta^3)) with tag 1
    for inputs and 2 for outputs (matching constraints.io_multiset).
    Returns a QM31 4-tuple; zero for empty tapes."""
    entries = ([(1, i, v) for i, v in enumerate(inputs)]
               + [(2, j, v) for j, v in enumerate(outputs)])
    if not entries:
        return (0, 0, 0, 0)
    m = len(entries)
    comp = [np.zeros(m, dtype=np.uint32) for _ in range(4)]
    for r, (tag, idx, v) in enumerate(entries):
        comp[0][r] = tag
        comp[1][r] = idx
        comp[2][r] = v & 0xFFFFF
        comp[3][r] = (v >> 20) & 0xFFFFF
    bw = _beta_minus_compress_np(comp, beta, delta)
    out = _qm31_inv_sum_kernel(tuple(jnp.asarray(r) for r in bw))
    return tuple(int(x) for x in out)


@jax.jit
def _two_sided_sum_kernel(wr4, ww4, num_r, num_w):
    """F = num_r/(wr) + num_w/(ww) per row, with its exclusive prefix
    sums (both QM31)."""
    from ..ops.qm31 import qm31_add, qm31_batch_inv

    n = num_r.shape[0]
    stacked = tuple(jnp.concatenate([wr4[k], ww4[k]]) for k in range(4))
    inv = qm31_batch_inv(stacked)
    term = qm31_add(_qscale_m31(tuple(c[:n] for c in inv), num_r),
                    _qscale_m31(tuple(c[n:] for c in inv), num_w))
    return _exclusive_cumsum4(term), term


def _io_partial_sum(padded: np.ndarray, beta, delta):
    """The I/O multiset partial-sum (S, exclusive) and per-row term (F)
    columns (QM31 4-tuples, [n] each): F_i = erd_i/(beta - wr_i)
    + ewr_i/(beta - ww_i) with wr/ww the delta-compressed READ/WRITE
    tuples of constraints.io_multiset."""
    from .constraints import COL_ERD, COL_EWR, COL_RIDX, COL_WIDX

    n = padded.shape[0]
    wr_comp = [np.ones(n, dtype=np.uint32),
               padded[:, COL_RIDX],
               np.roll(padded[:, 8 + 10], -1),
               np.roll(padded[:, 24 + 10], -1)]
    ww_comp = [np.full(n, 2, dtype=np.uint32),
               padded[:, COL_WIDX],
               padded[:, 8 + 11],
               padded[:, 24 + 11]]
    wr4 = tuple(jnp.asarray(r) for r in
                _beta_minus_compress_np(wr_comp, beta, delta))
    ww4 = tuple(jnp.asarray(r) for r in
                _beta_minus_compress_np(ww_comp, beta, delta))
    erd = jnp.asarray(padded[:, COL_ERD])
    ewr = jnp.asarray(padded[:, COL_EWR])
    return _two_sided_sum_kernel(wr4, ww4, erd, ewr)


def extract_crypto_tape(matrix: np.ndarray):
    """The claimed public crypto tape read off a trace matrix: one
    entry per crypto CHUNK ROW (in cidx order) of
    ``(num, len, more, msg_bytes)`` where len is THIS chunk's byte
    count (8*nc - pad), ``more`` flags a non-final chunk, and msg_bytes
    are the 56 committed input-cell bytes (zero beyond the active
    slots; the chunk's hash input is ``msg_bytes[:len]``).  A chain's
    full message is the concatenation of its consecutive entries."""
    from .trace import (COL_CMORE, COL_CNA0, COL_CPAD, COL_CRB0, COL_ECR,
                        N_READ_SLOTS)

    rows = np.nonzero(matrix[:, COL_ECR])[0]
    entries = []
    for r in rows:
        num = int(matrix[r, 8 + 10])
        nc = int(np.nonzero(matrix[r, COL_CNA0:COL_CNA0 + 8])[0][0])
        ln = 8 * nc - int(matrix[r, COL_CPAD])
        msg = [int(matrix[r, COL_CRB0 + k])
               for k in range(8 * N_READ_SLOTS)]
        entries.append({"num": num, "len": ln,
                        "more": int(matrix[r, COL_CMORE]), "msg": msg})
    return entries


def crypto_tape_demand(entries, beta, delta):
    """The VERIFIER-computed crypto-tape demand.  Entries are per
    CHUNK ROW; consecutive entries with ``more = 1`` chain into one
    logical message (multi-block hashing — trace.py layout comment at
    CR_BASE), whose digest is RECOMPUTED from the claimed chunk bytes
    (trace.crypto_digest) and demanded on the FINAL entry (non-final
    entries demand all-zero digest bytes, matching the pinned-zero
    write slots) — so an accepted proof attests that every crypto
    syscall's in-memory digest is the true hash of its full in-memory
    input, however many chunks it spans.  Returns a QM31 4-tuple; zero
    for an empty tape; None (reject) for a malformed claimed tape."""
    from .trace import CRYPTO_MAX_LEN, N_READ_SLOTS, crypto_digest

    if not entries:
        return (0, 0, 0, 0)
    m = len(entries)
    n_comp = 4 + 8 * N_READ_SLOTS + 32
    comp = [np.zeros(m, dtype=np.uint32) for _ in range(n_comp)]
    acc = bytearray()      # current chain's accumulated message
    acc_num = None
    for i, e in enumerate(entries):
        num, ln = int(e["num"]), int(e["len"])
        more = int(e.get("more", 0))
        msg = [int(b) for b in e["msg"]]
        if not (3 <= num <= 6) or not (0 <= ln <= CRYPTO_MAX_LEN) \
                or more not in (0, 1) \
                or len(msg) != 8 * N_READ_SLOTS \
                or any(not 0 <= b < 256 for b in msg):
            return None  # malformed claimed tape -> reject
        if acc_num is not None and num != acc_num:
            return None  # a chain cannot change algorithm mid-way
        if more and ln != CRYPTO_MAX_LEN:
            return None  # non-final chunks carry exactly 56 bytes
        acc += bytes(msg[:ln])
        acc_num = num
        digest = b"\x00" * 32 if more else crypto_digest(num, bytes(acc))
        if not more:
            acc = bytearray()
            acc_num = None
        comp[0][i] = num
        comp[1][i] = i
        comp[2][i] = ln
        comp[3][i] = more
        for k in range(8 * N_READ_SLOTS):
            comp[4 + k][i] = msg[k]
        for k in range(32):
            comp[4 + 8 * N_READ_SLOTS + k][i] = digest[k]
    if acc_num is not None:
        return None  # dangling chain (last entry claims more)
    t4 = _delta_compress_dev([jnp.asarray(c) for c in comp], delta)
    out = _qm31_inv_sum_kernel(_beta_minus(beta, t4))
    return tuple(int(x) for x in out)


def _observe_crypto(challenger, entries) -> None:
    """Feed the claimed crypto tape into the Fiat-Shamir transcript
    (identically on prover and verifier)."""
    challenger.observe(len(entries))
    for e in entries:
        challenger.observe(int(e["num"]))
        challenger.observe(int(e["len"]))
        challenger.observe(int(e.get("more", 0)))
        challenger.observe_many(int(b) for b in e["msg"])


def _crypto_slot_inverses(padded: np.ndarray, beta, delta):
    """The committed phase-2 slot-inverse columns (QM31 4-tuple
    [N_SLOTS, n]): inv_s = active_s / (beta - w_s) with w_s the
    delta-compressed 19-component slot tuple (constraints.
    crypto_slot_constraints).  Their per-row sum joins the memory F
    column."""
    from ..ops.qm31 import qm31_batch_inv

    from .constraints import COL_CLK, N_SLOTS
    from .trace import (COL_CBLK, COL_CMORE, COL_CNA0, COL_CRB0, COL_CRC0,
                        COL_CRC1, COL_CWC1, COL_CWD0, COL_CWO0, COL_ECR,
                        N_READ_SLOTS, N_WRITE_SLOTS)

    n = padded.shape[0]
    inv8 = pow(8, P - 2, P)
    clk = padded[:, COL_CLK].astype(np.uint64)
    na = padded[:, COL_CNA0:COL_CNA0 + 8]
    ecr = padded[:, COL_ECR]
    cblk7 = 7 * padded[:, COL_CBLK].astype(np.uint64)
    elast = ((ecr.astype(np.int64)
              - padded[:, COL_CMORE].astype(np.int64)) % P).astype(
        np.uint32)
    w_stack = []     # per-slot component lists
    act_stack = []
    for s in range(N_SLOTS):
        if s < N_READ_SLOTS:
            i = s
            lo = padded[:, 8 + 11].astype(np.uint64)
            hi = padded[:, 24 + 11].astype(np.uint64)
            carry = (padded[:, COL_CRC0].astype(np.uint64) if i == 0
                     else padded[:, COL_CRC1 + i - 1].astype(np.uint64))
            ts = 2 * clk + 1
            ob = [padded[:, COL_CRB0 + 8 * i + j] for j in range(8)]
            nb = ob
            offset = cblk7 + i
            active = na[:, i + 1:].sum(axis=1).astype(np.uint32)
        else:
            i = s - N_READ_SLOTS
            lo = padded[:, 8 + 13].astype(np.uint64)
            hi = padded[:, 24 + 13].astype(np.uint64)
            carry = (np.zeros(n, dtype=np.uint64) if i == 0
                     else padded[:, COL_CWC1 + i - 1].astype(np.uint64))
            ts = 2 * clk + 2
            ob = [padded[:, COL_CWO0 + 8 * i + j] for j in range(8)]
            nb = [padded[:, COL_CWD0 + 8 * i + j] for j in range(8)]
            offset = np.uint64(i)
            active = elast
        q_s = (lo * inv8 + offset + (P - ((carry << 17) % P))) % P
        ahi_s = (hi + carry) % P
        comps = [q_s.astype(np.uint32), ahi_s.astype(np.uint32),
                 ts.astype(np.uint32)] + list(ob) + list(nb)
        w_stack.append(comps)
        act_stack.append(active)
    comp_mats = [
        np.stack([w_stack[s][c] for s in range(N_SLOTS)])
        for c in range(19)
    ]
    bw = _beta_minus_compress_np(comp_mats, beta, delta)
    act = jnp.asarray(np.stack(act_stack).astype(np.uint32))
    return _masked_inv_kernel(tuple(jnp.asarray(r) for r in bw), act)


def _crypto_tape_partial_sum(padded: np.ndarray, beta, delta):
    """The crypto-tape channel's S (exclusive partial sums) and F
    (per-row term ecr/(beta - w_tape)) columns (QM31 4-tuples [n])."""
    from ..ops.qm31 import qm31_batch_inv

    from .trace import (COL_CIDX, COL_CMORE, COL_CNA0, COL_CPAD,
                        COL_CRB0, COL_CWD0, COL_ECR, N_READ_SLOTS,
                        N_WRITE_SLOTS)

    n = padded.shape[0]
    num = padded[:, 8 + 10] * padded[:, COL_ECR]   # R10 low limb on
    # crypto rows (= b0 + 2 b1 + 4 b2 there), zero elsewhere.
    nc = (padded[:, COL_CNA0:COL_CNA0 + 8]
          * np.arange(8, dtype=np.uint32)).sum(axis=1)
    ln = (8 * nc.astype(np.int64)
          - padded[:, COL_CPAD].astype(np.int64)) % P
    comps = [num.astype(np.uint32), padded[:, COL_CIDX],
             ln.astype(np.uint32), padded[:, COL_CMORE]]
    comps += [padded[:, COL_CRB0 + k] for k in range(8 * N_READ_SLOTS)]
    comps += [padded[:, COL_CWD0 + k] for k in range(8 * N_WRITE_SLOTS)]
    bw = _beta_minus_compress_np(comps, beta, delta)
    f4 = _masked_inv_kernel(tuple(jnp.asarray(r) for r in bw),
                            jnp.asarray(padded[:, COL_ECR]))
    return _exclusive_cumsum4_jit(f4), f4


def _channel_witnesses(padded: np.ndarray) -> np.ndarray:
    """Evaluate every CHANNELS affine witness over the trace rows:
    uint32 [n_channels, n] (values in [0, p))."""
    from .constraints import CHANNELS

    n = padded.shape[0]
    out = np.zeros((len(CHANNELS), n), dtype=np.uint32)
    for k, (_, const, terms) in enumerate(CHANNELS):
        acc = np.full(n, const % P, dtype=np.uint64)
        for c, coef in terms:
            acc = (acc + padded[:, c].astype(np.uint64) * (coef % P)) % P
        out[k] = acc.astype(np.uint32)
    return out


def _build_lookup_columns(padded: np.ndarray):
    """Append the table column t_i = min(i, 1023), one multiplicity
    histogram per lookup channel, and one per aux-table channel (all
    challenge-independent -> phase 1)."""
    from .constraints import AUX_CHANNELS

    n = padded.shape[0]
    assert n >= 1024, "range lookup needs >= 1024 rows (full table)"
    t_col = np.minimum(np.arange(n), 1023).astype(np.uint32)
    witnesses = _channel_witnesses(padded)
    m_cols = [
        np.bincount(w, minlength=n)[:n].astype(np.uint32)
        for w in witnesses
    ]
    for _, _, _, idx_terms in AUX_CHANNELS:
        idx = np.zeros(n, dtype=np.int64)
        for c, coef in idx_terms:
            idx += padded[:, c].astype(np.int64) * coef
        if (idx < 0).any() or (idx >= n).any():
            raise ValueError("aux-channel witness outside its table")
        m_cols.append(np.bincount(idx, minlength=n)[:n].astype(np.uint32))
    return np.concatenate(
        [padded, t_col[:, None]] + [m[:, None] for m in m_cols], axis=1)


@jax.jit
def _channel_sum_kernel(witnesses, t, m, beta):
    """All plain lookup channels in one dispatch: witnesses [n_ch, n],
    table t [n], multiplicities m [n_ch, n], beta a traced QM31 4-tuple.
    Term: 1/(beta - w) - m/(beta - t); S = exclusive cumsum."""
    from ..ops.field_ops import m31_sub as js
    from ..ops.qm31 import qm31_batch_inv, qm31_sub

    n_ch, n = witnesses.shape
    stacked = jnp.concatenate([witnesses, t[None, :]], axis=0)
    d4 = tuple(js(jnp.broadcast_to(jnp.asarray(beta[k], jnp.uint32),
                                   stacked.shape),
                  stacked if k == 0 else jnp.zeros_like(stacked))
               for k in range(4))
    inv = qm31_batch_inv(d4)
    iw = tuple(c[:n_ch] for c in inv)
    it = tuple(jnp.broadcast_to(c[n_ch], (n_ch, n)) for c in inv)
    term = qm31_sub(iw, _qscale_m31(it, m))
    return _exclusive_cumsum4(term), term


def _build_partial_sums(padded: np.ndarray, beta):
    """The LogUp partial-sum columns on the trace domain (QM31
    4-tuples [n_ch, n]), one per channel, in one device dispatch:

    s_k[0] = 0; s_k[i+1] = s_k[i] + 1/(beta - w_k[i]) - m_k[i]/(beta - t_i).
    """
    from .constraints import CHANNELS, COL_MULT0, COL_TABLE

    n_ch = len(CHANNELS)
    witnesses = jnp.asarray(_channel_witnesses(padded))     # [n_ch, n]
    t = jnp.asarray(padded[:, COL_TABLE])
    m = jnp.asarray(
        np.stack([padded[:, COL_MULT0 + k] for k in range(n_ch)]))
    beta_t = tuple(jnp.asarray(b % P, jnp.uint32) for b in beta)
    (s4, _f4) = _channel_sum_kernel(witnesses, t, m, beta_t)
    return s4


def _build_aux_partial_sums(padded: np.ndarray, aux_cols: np.ndarray,
                            beta, eta):
    """The aux-table channels' LogUp partial-sum columns (QM31 4-tuples,
    [NUM_AUX, n]): witness and table triples are eta-compressed
    (aux_table.py), so both sides are QM31-valued.  Compression on the
    host (cheap elementwise numpy), inversion + prefix sums in one
    device kernel."""
    from .constraints import AUX_CHANNELS, COL_AUXM0

    n = padded.shape[0]
    bw_rows = []
    bt_rows = []
    m_rows = []
    for k, (_, wspecs, t_base, _idx) in enumerate(AUX_CHANNELS):
        comps = []
        for terms in wspecs:
            acc = np.zeros(n, dtype=np.uint64)
            for c, coef in terms:
                acc = (acc + padded[:, c].astype(np.uint64) * coef) % P
            comps.append(acc)
        bw_rows.append(_beta_minus_compress_np(comps, beta, eta))
        bt_rows.append(_beta_minus_compress_np(
            [aux_cols[t_base + j] for j in range(3)], beta, eta))
        m_rows.append(padded[:, COL_AUXM0 + k])

    bw = np.stack(bw_rows, axis=1)   # [4, NUM_AUX, n]
    bt = np.stack(bt_rows, axis=1)
    m = jnp.asarray(np.stack(m_rows))
    (s4, _f4) = _aux_sum_kernel(
        tuple(jnp.asarray(bw[k]) for k in range(4)),
        tuple(jnp.asarray(bt[k]) for k in range(4)), m)
    return s4


@jax.jit
def _aux_sum_kernel(bw4, bt4, m):
    from ..ops.qm31 import qm31_batch_inv, qm31_sub

    n_ch = m.shape[0]
    stacked = tuple(jnp.concatenate([bw4[k], bt4[k]], axis=0)
                    for k in range(4))
    inv = qm31_batch_inv(stacked)
    iw = tuple(c[:n_ch] for c in inv)
    it = tuple(c[n_ch:] for c in inv)
    term = qm31_sub(iw, _qscale_m31(it, m))
    return _exclusive_cumsum4(term), term


CODE_BASE = 0x1000
_M20 = (1 << 20) - 1


def _program_table(code_words, log_n: int) -> np.ndarray:
    """The preprocessed program table, uint32 [4, n]: per instruction i at
    pc = CODE_BASE + 4i the tuple (pc_lo, pc_hi, word & 0x7FFF,
    word >> 15); rows beyond the program hold the halt entry
    (0, 0, EBREAK, 0) that padding rows consume."""
    n = 1 << log_n
    n_code = len(code_words)
    if n_code + 1 > n:
        raise ValueError("program binding needs n_rows >= n_code + 1")
    cols = np.zeros((4, n), dtype=np.uint32)
    words = np.asarray(code_words, dtype=np.uint64)
    pcs = CODE_BASE + 4 * np.arange(n_code, dtype=np.uint64)
    cols[0, :n_code] = pcs & _M20
    cols[1, :n_code] = (pcs >> 20) & _M20
    cols[2, :n_code] = words & 0x7FFF
    cols[3, :n_code] = words >> 15
    cols[2, n_code:] = 0x51
    return cols


def preprocess_program(code_words, log_n: int,
                       fri_config: FriConfig = FriConfig()):
    """Deterministic preprocessed commitment of a program: LDE the table
    columns onto the proof coset and Merkle-commit them.  The root is the
    PUBLIC INPUT binding proofs to this program — verifiers recompute it
    once per (program, log_n) and compare."""
    shift = _coset_shift()
    cols = _program_table(code_words, log_n)
    ext_r, ext_i = lde(jnp.asarray(cols), jnp.zeros_like(jnp.asarray(cols)),
                       log_n, fri_config.log_blowup, shift=shift)
    rows = _interleave_rows(ext_r, ext_i)  # [N, 8]
    levels = merkle.to_host(merkle.build_tree_fused(merkle.hash_rows(rows)))
    return {
        "cols": cols,
        "ext": (ext_r, ext_i),
        "rows": np.asarray(rows),
        "levels": levels,
        "root": [int(x) for x in merkle.root(levels)],
    }


def _program_multiplicity(padded: np.ndarray, n_real: int,
                          n_code: int) -> np.ndarray:
    """Executions per program row (+ padding count on the halt entry)."""
    from .constraints import COL_PC_HI, COL_PC_LO

    n = padded.shape[0]
    pc = (padded[:, COL_PC_LO].astype(np.int64)
          + (padded[:, COL_PC_HI].astype(np.int64) << 20))
    idx = (pc - CODE_BASE) >> 2
    idx[n_real:] = n_code                     # padding -> halt entry
    if ((idx < 0) | (idx >= n)).any():
        raise ValueError("trace pc outside the program table")
    return np.bincount(idx, minlength=n)[:n].astype(np.uint32)


def _program_partial_sum(padded: np.ndarray, prog_cols: np.ndarray,
                         beta, gamma):
    """The program-channel LogUp partial-sum column (QM31 4-tuple [n]):
    term = 1/(beta - w) - m/(beta - t) with the gamma-compressed
    (pc, field, imm) tuples of constraints.program_channel."""
    from ..ops.qm31 import qm31_mul_scalar

    from .constraints import COL_IMM_LO, COL_PC_HI, COL_PC_LO, COL_PROG_M, \
        PROG_F_TERMS

    n = padded.shape[0]
    f_trace = np.zeros(n, dtype=np.uint64)
    for c, coef in PROG_F_TERMS:
        f_trace = (f_trace + padded[:, c].astype(np.uint64) * coef) % P

    bw = _beta_minus_compress_np(
        [padded[:, COL_PC_LO], padded[:, COL_PC_HI], f_trace,
         padded[:, COL_IMM_LO]], beta, gamma)
    bt = _beta_minus_compress_np(
        [prog_cols[0], prog_cols[1], prog_cols[2], prog_cols[3]],
        beta, gamma)
    m = jnp.asarray(padded[:, COL_PROG_M])
    one = jnp.ones(n, jnp.uint32)
    # term = 1/(beta - w) - m/(beta - t): the memory kernel's shape.
    (s4, _f4) = _memory_partial_sum_kernel(
        tuple(jnp.asarray(r) for r in bw),
        tuple(jnp.asarray(r) for r in bt), one, m)
    return s4


@jax.jit
def _combine_kernel(ar, ai, pw_r, pw_i):
    """sum_c pw_c * col_c over CM31 as ONE dispatch: 4 broadcast
    multiplies + a log-depth modular tree reduction (the eager
    per-column loop was ~7 dispatches x ~370 columns)."""
    from ..ops.field_ops import m31_add, m31_mul, m31_sub

    tr = m31_sub(m31_mul(ar, pw_r[:, None]), m31_mul(ai, pw_i[:, None]))
    ti = m31_add(m31_mul(ar, pw_i[:, None]), m31_mul(ai, pw_r[:, None]))

    def red(x):
        while x.shape[0] > 1:
            if x.shape[0] & 1:
                x = jnp.concatenate(
                    [x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
            x = m31_add(x[0::2], x[1::2])
        return x[0]

    return red(tr), red(ti)


def _combine(ext_r, ext_i, extra_cols, alpha):
    """sum_i alpha^i col_i + sum_j alpha^(n_cols+j) extra_j with a QM31
    alpha over CM31-valued committed columns: the result is QM31 — its
    a/b coordinates are each one run of the CM31 combine kernel."""
    from ..ops.qm31 import qm31_mul_scalar

    n_cols = ext_r.shape[0]
    n_total = n_cols + len(extra_cols)
    pw = np.zeros((n_total, 4), dtype=np.uint32)
    power = (1, 0, 0, 0)
    for k in range(n_total):
        pw[k] = power
        power = qm31_mul_scalar(power, alpha)
    if extra_cols:
        ar = jnp.concatenate(
            [ext_r, jnp.stack([c[0] for c in extra_cols])], axis=0)
        ai = jnp.concatenate(
            [ext_i, jnp.stack([c[1] for c in extra_cols])], axis=0)
    else:
        ar, ai = ext_r, ext_i
    a_part = _combine_kernel(ar, ai, jnp.asarray(pw[:, 0]),
                             jnp.asarray(pw[:, 1]))
    b_part = _combine_kernel(ar, ai, jnp.asarray(pw[:, 2]),
                             jnp.asarray(pw[:, 3]))
    return (a_part[0], a_part[1], b_part[0], b_part[1])



def _interleave_rows(ext_r, ext_i):
    """[C, N] CM31 column evals -> committed rows [N, 2C] with the
    (re_c, im_c) pairs INTERLEAVED — so a column-streaming commit
    (ops/merkle.RowSponge) absorbs each block's contribution in row
    order and produces the same root as the one-shot path."""
    return jnp.stack([ext_r.T, ext_i.T], axis=2).reshape(
        ext_r.shape[1], -1)

def _open_rows(committed_np, levels, indices):
    """``committed_np``: a full [N, w] host array OR a {row_index: row}
    dict from ``_gather_rows`` (only the queried rows transferred)."""
    return {
        str(j): {
            "row": [int(x) for x in committed_np[j]],
            "path": [[int(x) for x in sib]
                     for sib in merkle.open_path(levels, j)],
        }
        for j in indices
    }


def _gather_rows(matrix_dev, indices):
    """Fetch only the needed rows of a committed device matrix to host:
    one gather + one small transfer instead of materializing [N, w]."""
    idx = sorted(set(int(j) for j in indices))
    vals = np.asarray(matrix_dev[jnp.asarray(idx, dtype=jnp.int32)])
    return {j: vals[k] for k, j in enumerate(idx)}


class _StageStore:
    """Per-stage prove checkpoints (elastic recovery): each heavy stage's
    artifacts persist under ``dir/<key>.<stage>.pkl`` where the key binds
    the full prove input (trace bytes + FRI config + program + flags).  A
    killed prove rerun with the same inputs loads completed stages and
    recomputes only the rest; all challenges are Fiat-Shamir, so the
    resumed proof is bit-identical.  Corrupt/partial files (a kill mid-
    write) are treated as absent — stages write to a temp file and
    rename, so a torn write never wins."""

    def __init__(self, directory, matrix, fri_config, range_lookup,
                 program):
        import hashlib as _hl
        import os

        os.makedirs(directory, exist_ok=True)
        self.dir = directory
        h = _hl.sha256()
        h.update(matrix.tobytes())
        h.update(repr((matrix.shape, fri_config, range_lookup)).encode())
        h.update(program.to_bytes() if program is not None else b"")
        self.key = h.hexdigest()[:24]

    def _path(self, stage):
        import os

        return os.path.join(self.dir, f"{self.key}.{stage}.pkl")

    def load(self, stage):
        import pickle

        try:
            with open(self._path(stage), "rb") as f:
                return pickle.load(f)
        except Exception:
            return None

    def save(self, stage, obj) -> None:
        import os
        import pickle

        tmp = self._path(stage) + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=4)
        os.replace(tmp, self._path(stage))


def _stage_logger():
    """Opt-in stage timing (ZKIR_PROVE_LOG=1): one stderr line per prove
    stage — the only way to see where a remote-TPU prove is spending
    its time."""
    import os
    import sys
    import time as _t

    if not os.environ.get("ZKIR_PROVE_LOG"):
        return lambda msg: None
    t0 = _t.perf_counter()

    def log(msg):
        print(f"[prove {_t.perf_counter() - t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)
    return log


def prove_trace(matrix: np.ndarray,
                fri_config: FriConfig = FriConfig(),
                mesh=None, range_lookup: bool = False,
                program=None, selfcheck: bool = True,
                checkpoint_dir=None) -> Dict[str, Any]:
    """Prove the trace matrix.  With ``mesh``, the heavy stages run sharded
    (pjit style): columns are partitioned for the LDE, rows for hashing —
    the sharding annotations let XLA insert the collectives; the proof is
    bit-identical to the single-device one.

    With ``range_lookup``, the chunk-decomposition witness columns are
    additionally proven to lie in [0, 1024) via in-circuit LogUp: table +
    multiplicity columns join phase 1, partial-sum columns are committed
    in a second phase after the beta challenge, and the degree-3 LogUp +
    table-pinning constraints enter the quotient.

    With ``program`` (a spec.Program; requires ``range_lookup``), every
    row's (pc, instruction-field) tuple is additionally LogUp-bound to
    the preprocessed program table whose Merkle root is a public input
    (``preprocess_program``), and the first row is pinned to the entry
    point.

    With ``checkpoint_dir``, each heavy stage (trace commit, partial
    sums, quotient, FRI) persists its artifacts there; a killed prove
    rerun with identical inputs resumes past completed stages and emits
    a bit-identical proof (all challenges are Fiat-Shamir)."""
    if program is not None and not range_lookup:
        raise ValueError("program binding requires range_lookup=True")
    log = _stage_logger()
    matrix = np.asarray(matrix, dtype=np.uint32)
    store = (None if checkpoint_dir is None else
             _StageStore(checkpoint_dir, matrix, fri_config, range_lookup,
                         program))
    n_real = matrix.shape[0]
    padded, log_n = _pad_rows(matrix, min_log=10 if range_lookup else 2)
    if range_lookup:
        _build_memory_table(padded, n_real, program=program)
    prog = None
    entry_point = 0
    aux_pre = None
    if range_lookup:
        aux_pre = preprocess_aux(log_n, fri_config.log_blowup)
    if program is not None:
        code_words = list(program.code)
        entry_point = int(program.header.entry_point)
        prog = preprocess_program(code_words, log_n, fri_config)
    if range_lookup:
        padded = _build_lookup_columns(padded)
        if prog is not None:
            m_prog = _program_multiplicity(padded, n_real, len(code_words))
            padded = np.concatenate([padded, m_prog[:, None]], axis=1)
    n_cols = padded.shape[1]
    log_big = log_n + fri_config.log_blowup
    big = 1 << log_big
    shift = _coset_shift()

    # Coset LDE of all columns: [cols, n] -> [cols, N], then phase 1:
    # commit the trace columns.  Stage-checkpointed as "commit".
    ck = store.load("commit") if store is not None else None
    if ck is not None:
        ext_r = jnp.asarray(ck["ext_r"])
        ext_i = jnp.asarray(ck["ext_i"])
        levels1 = ck["levels1"]
        trace_rows = _interleave_rows(ext_r, ext_i)
    else:
        cols_r = jnp.asarray(padded.T)
        cols_i = jnp.zeros_like(cols_r)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            # Pad the column count to the mesh size for an even split.
            n_dev = mesh.devices.size
            pad_cols = (-n_cols) % n_dev
            if pad_cols:
                cols_r = jnp.concatenate(
                    [cols_r, jnp.zeros((pad_cols, cols_r.shape[1]),
                                       dtype=jnp.uint32)], axis=0)
                cols_i = jnp.zeros_like(cols_r)
            col_sharding = NamedSharding(mesh, P(axis, None))
            cols_r = jax.device_put(cols_r, col_sharding)
            cols_i = jax.device_put(cols_i, col_sharding)
        ext_r, ext_i = lde(cols_r, cols_i, log_n, fri_config.log_blowup,
                           shift=shift)
        if mesh is not None and ext_r.shape[0] != n_cols:
            ext_r = ext_r[:n_cols]
            ext_i = ext_i[:n_cols]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            row_sharding = NamedSharding(mesh, P(axis, None))
            ext_r = jax.device_put(ext_r.T, row_sharding).T
            ext_i = jax.device_put(ext_i.T, row_sharding).T

        import os as _os

        if _os.environ.get("ZKIR_PROVE_LOG"):   # sub-stage timing syncs
            jax.block_until_ready(ext_r)
            log(f"lde done ({n_cols} cols)")
        trace_rows = _interleave_rows(ext_r, ext_i)
        leaves1 = merkle.hash_rows(trace_rows)
        if _os.environ.get("ZKIR_PROVE_LOG"):
            jax.block_until_ready(leaves1)
            log("trace rows hashed")
        levels1 = merkle.to_host(merkle.build_tree_fused(leaves1))
        if store is not None:
            store.save("commit", {"ext_r": np.asarray(ext_r),
                                  "ext_i": np.asarray(ext_i),
                                  "levels1": levels1})
    root1 = merkle.root(levels1)
    log(f"trace committed ({n_cols} cols, 2^{log_n} rows)")

    challenger = Challenger()
    challenger.observe(log_n)
    challenger.observe(n_cols)
    challenger.observe_many(int(x) for x in root1)
    if aux_pre is not None:
        challenger.observe_many(int(x) for x in aux_pre["root"])
    if prog is not None:
        challenger.observe_many(int(x) for x in prog["root"])
        challenger.observe(entry_point)
        challenger.observe(len(code_words))
    io_inputs = io_outputs = None
    crypto_tape = None
    if range_lookup:
        # The claimed public I/O and crypto tapes enter the transcript
        # before the beta/delta draws (Fiat-Shamir binding).
        io_inputs, io_outputs = extract_io(padded)
        _observe_io(challenger, io_inputs, io_outputs)
        crypto_tape = extract_crypto_tape(padded)
        _observe_crypto(challenger, crypto_tape)

    # Phase 1.5 (lookup only): beta challenge -> partial-sum columns.
    # All challenges are QM31 (ops/qm31.py).  Sums-column layout (QM31
    # values, committed as 2*n_sums CM31 columns: a-parts 0..n_sums-1,
    # b-parts n_sums..2*n_sums-1): NUM_LOOKUP channel sums, NUM_AUX
    # aux-table channel sums, the memory multiset S and F, the io S and
    # F, then (if program-bound) the program sum.
    lookup = None
    aux_args = None
    memory_args = None
    io_args = None
    crypto_args = None
    program_args = None
    levels_s = None
    s_rows = None
    from .constraints import N_CR_SUMS, N_SLOTS

    n_sums = (NUM_LOOKUP + NUM_AUX + 4 + N_CR_SUMS
              + (1 if program is not None else 0)) if range_lookup else 0
    # End-to-end soundness floor: the QM31 batching/DEEP term must also
    # clear min_security (round 3's CM31 draws silently capped large
    # traces at 29 bits; see FriConfig.security_bits).
    total_terms = n_cols + 2 * n_sums + 4
    if fri_config.security_bits(log_big, total_terms) \
            < fri_config.min_security:
        raise ValueError(
            f"end-to-end soundness {fri_config.security_bits(log_big, total_terms)}"
            f" bits < min_security={fri_config.min_security} for "
            f"log_n={log_n} with {total_terms} batched terms")
    if range_lookup:
        beta = challenger.sample_qm31()
        gamma = challenger.sample_qm31() if prog is not None else None
        delta = challenger.sample_qm31()
        eta = challenger.sample_qm31()
        ck = store.load("sums") if store is not None else None
        if ck is not None:
            s_ext_r = jnp.asarray(ck["s_ext_r"])
            s_ext_i = jnp.asarray(ck["s_ext_i"])
            levels_s = ck["levels_s"]
            s_rows = _interleave_rows(s_ext_r, s_ext_i)
        else:
            s_chan = _build_partial_sums(padded, beta)
            s_aux = _build_aux_partial_sums(padded, aux_pre["cols"],
                                            beta, eta)
            slot_inv4 = _crypto_slot_inverses(padded, beta, delta)
            sm4, fm4 = _memory_partial_sum(padded, beta, delta)
            # The memory F column carries the crypto-slot demands too
            # (constraints.memory_multiset slot_sum); fold them in and
            # rebuild its exclusive prefix sums.
            from ..ops.qm31 import qm31_add as _qadd
            slot_total = tuple(
                (c.astype(jnp.int64).sum(axis=0)
                 % M31_PRIME).astype(jnp.uint32)
                for c in slot_inv4)
            fm4 = _qadd(fm4, slot_total)
            sm4 = _exclusive_cumsum4(fm4)
            si4, fi4 = _io_partial_sum(padded, beta, delta)
            scr4, fcr4 = _crypto_tape_partial_sum(padded, beta, delta)
            groups = [s_chan, s_aux,
                      tuple(c[None, :] for c in sm4),
                      tuple(c[None, :] for c in fm4),
                      tuple(c[None, :] for c in si4),
                      tuple(c[None, :] for c in fi4),
                      slot_inv4,
                      tuple(c[None, :] for c in scr4),
                      tuple(c[None, :] for c in fcr4)]
            if prog is not None:
                sp4 = _program_partial_sum(padded, prog["cols"],
                                           beta, gamma)
                groups.append(tuple(c[None, :] for c in sp4))
            comp = [jnp.concatenate([g[k] for g in groups], axis=0)
                    for k in range(4)]            # [n_sums, n] x 4
            s_r = jnp.concatenate([comp[0], comp[2]], axis=0)
            s_i = jnp.concatenate([comp[1], comp[3]], axis=0)
            # Free the per-channel intermediates: otherwise they stay
            # referenced by these locals for the rest of the prove
            # (several GB of dead HBM at large domains).
            del s_chan, s_aux, slot_inv4, sm4, fm4, si4, fi4, scr4, fcr4
            del slot_total, groups, comp
            if prog is not None:
                del sp4
            s_ext_r, s_ext_i = lde(s_r, s_i, log_n,
                                   fri_config.log_blowup, shift=shift)
            s_rows = _interleave_rows(s_ext_r, s_ext_i)
            levels_s = merkle.to_host(
                merkle.build_tree_fused(merkle.hash_rows(s_rows)))
            if store is not None:
                store.save("sums", {"s_ext_r": np.asarray(s_ext_r),
                                    "s_ext_i": np.asarray(s_ext_i),
                                    "levels_s": levels_s})
        root_s = merkle.root(levels_s)
        log(f"partial sums committed ({n_sums} QM31 columns)")
        challenger.observe_many(int(x) for x in root_s)

        def sq(lo, hi=None):
            """QM31 view of sums columns [lo, hi) (or a single one)."""
            if hi is None:
                return (s_ext_r[lo], s_ext_i[lo],
                        s_ext_r[n_sums + lo], s_ext_i[n_sums + lo])
            return (s_ext_r[lo:hi], s_ext_i[lo:hi],
                    s_ext_r[n_sums + lo:n_sums + hi],
                    s_ext_i[n_sums + lo:n_sums + hi])

        lookup = (sq(0, NUM_LOOKUP), beta)
        aux_args = (aux_pre["ext"],
                    sq(NUM_LOOKUP, NUM_LOOKUP + NUM_AUX), eta)
        i_mem = NUM_LOOKUP + NUM_AUX
        d_init = memory_init_demand(program, beta, delta)
        memory_args = ((sq(i_mem), sq(i_mem + 1)), delta, d_init)
        d_io = io_tape_demand(io_inputs, io_outputs, beta, delta)
        io_args = ((sq(i_mem + 2), sq(i_mem + 3)), delta, d_io)
        i_cr = i_mem + 4
        d_cr = crypto_tape_demand(crypto_tape, beta, delta)
        crypto_args = ((sq(i_cr, i_cr + N_SLOTS), sq(i_cr + N_SLOTS),
                        sq(i_cr + N_SLOTS + 1)), delta, d_cr)
        if prog is not None:
            program_args = (prog["ext"], sq(i_cr + N_CR_SUMS), gamma,
                            entry_point)

    alpha_c = challenger.sample_qm31()

    # Phase 2: quotient (QM31-valued), split into degree-< n chunks
    # Q(x) = Q0(x) + x^n Q1(x) (Plonky3-style quotient chunking: keeps
    # every committed column at the same FRI degree bound while allowing
    # constraints up to degree 3).  Each QM31 chunk is committed as two
    # CM31 coordinate columns (a + b*u), so q_rows is [N, 8].
    # Stage-checkpointed as "quotient".
    n_rows = 1 << log_n
    ck = store.load("quotient") if store is not None else None
    if ck is not None:
        q_cm_cols = [(jnp.asarray(ck[f"q{k}r"]), jnp.asarray(ck[f"q{k}i"]))
                     for k in range(4)]
        levels2 = ck["levels2"]
    else:
        q = quotient_evals(ext_r, ext_i, log_n, fri_config.log_blowup,
                           shift, alpha_c, lookup=lookup, aux=aux_args,
                           program=program_args, memory=memory_args,
                           io=io_args, crypto=crypto_args)
        q_coef = [coset_intt(q[0], q[1], log_big, shift=shift),
                  coset_intt(q[2], q[3], log_big, shift=shift)]
        if selfcheck:
            # Completeness self-check: Q is a polynomial of degree < 2n
            # iff every constraint divides cleanly.  The chunking below
            # silently DISCARDS coefficients [2n, 4n) — a violated
            # constraint would otherwise ship as a "proof" that only
            # fails at the verifier's pointwise check.  Catch it here,
            # at prove time, with a name.
            bad = any(
                np.asarray(c[2 * n_rows:]).any()
                for pair in q_coef for c in pair)
            if bad:
                from .constraints import diagnose_violations
                detail = diagnose_violations(
                    ext_r, ext_i, log_n, fri_config.log_blowup, shift,
                    lookup=lookup, aux=aux_args, program=program_args,
                    memory=memory_args, io=io_args, crypto=crypto_args)
                raise ConstraintViolation(
                    "trace violates the constraint system (quotient has "
                    f"degree >= 2n): {detail}")
        # CM31 coordinate columns in batch order:
        # (chunk0_a, chunk0_b, chunk1_a, chunk1_b).
        q_cm_cols = []
        for j in range(2):
            for coord in range(2):
                cr = jnp.zeros(big, dtype=jnp.uint32).at[:n_rows].set(
                    q_coef[coord][0][j * n_rows:(j + 1) * n_rows])
                ci = jnp.zeros(big, dtype=jnp.uint32).at[:n_rows].set(
                    q_coef[coord][1][j * n_rows:(j + 1) * n_rows])
                q_cm_cols.append(coset_ntt(cr, ci, log_big, shift=shift))
    q_rows = jnp.stack(
        [c for pair in q_cm_cols for c in pair], axis=1)   # [N, 8]
    if ck is None:
        levels2 = merkle.to_host(merkle.build_tree_fused(merkle.hash_rows(q_rows)))
        if store is not None:
            save = {"levels2": levels2}
            for k in range(4):
                save[f"q{k}r"] = np.asarray(q_cm_cols[k][0])
                save[f"q{k}i"] = np.asarray(q_cm_cols[k][1])
            store.save("quotient", save)
    root2 = merkle.root(levels2)
    log("quotient committed")
    challenger.observe_many(int(x) for x in root2)
    alpha_b = challenger.sample_qm31()

    # FRI (stage-checkpointed as "fri"; the challenger is not consulted
    # after fri_prove, so a loaded proof needs no transcript replay).
    ck = store.load("fri") if store is not None else None
    if ck is not None:
        fri_proof = ck
    else:
        extra_cols = []
        if range_lookup:
            extra_cols += [(s_ext_r[k], s_ext_i[k])
                           for k in range(s_ext_r.shape[0])]
        extra_cols += q_cm_cols
        batch4 = _combine(ext_r, ext_i, extra_cols, alpha_b)
        fri_proof = fri_prove(batch4, log_big, challenger,
                              fri_config, shift=shift)
        log("fri done")
        if store is not None:
            store.save("fri", fri_proof)

    # Phase 3: open commitment rows at the FRI query points (and their
    # next-row rotations for the transition constraints).  Only the
    # queried rows are transferred to host (one gather per matrix).
    half = big // 2
    blowup = 1 << fri_config.log_blowup
    all_indices = sorted({
        j
        for steps in fri_proof["queries"]
        for k in (steps[0]["leaf_idx"],)
        for j in (k, (k + blowup) % big, k + half,
                  (k + half + blowup) % big)
    })
    trace_np = _gather_rows(trace_rows, all_indices)
    q_np = _gather_rows(q_rows, all_indices)
    s_np = (_gather_rows(s_rows, all_indices)
            if s_rows is not None else None)
    openings = []
    for steps in fri_proof["queries"]:
        k = steps[0]["leaf_idx"]
        indices = sorted({
            k, (k + blowup) % big,
            k + half, (k + half + blowup) % big,
        })
        entry = {
            "trace": _open_rows(trace_np, levels1, indices),
            "quotient": _open_rows(q_np, levels2, indices),
        }
        if s_np is not None:
            entry["sums"] = _open_rows(s_np, levels_s, indices)
            entry["aux"] = _open_rows(aux_pre["rows"], aux_pre["levels"],
                                      indices)
        if prog is not None:
            entry["prog"] = _open_rows(prog["rows"], prog["levels"],
                                       indices)
        openings.append(entry)

    out = {
        "log_n": log_n,
        "n_cols": n_cols,
        "range_lookup": range_lookup,
        "trace_root": [int(x) for x in root1],
        "quotient_root": [int(x) for x in root2],
        "fri": fri_proof,
        "openings": openings,
    }
    if range_lookup:
        out["sums_root"] = [int(x) for x in merkle.root(levels_s)]
        out["io"] = {"inputs": io_inputs, "outputs": io_outputs}
        out["crypto"] = crypto_tape
    if prog is not None:
        out["program"] = {
            "root": prog["root"],
            "entry": entry_point,
            "n_code": len(code_words),
        }
    return out


def verify_trace(proof: Dict[str, Any], program=None) -> bool:
    """Verify a trace proof.

    With ``program`` (a spec.Program), the proof's program-binding
    commitment is recomputed from the public program and must match —
    i.e. the proof attests that THIS program executed from its entry
    point.  Without it, a program-bound proof is still checked for
    internal consistency against its committed (untrusted) table."""
    log_n = proof["log_n"]
    n_cols = proof["n_cols"]
    range_lookup = proof.get("range_lookup", False)
    prog_pub = proof.get("program")
    fri_proof = proof["fri"]
    config: FriConfig = fri_proof["config"]
    log_big = log_n + config.log_blowup
    big = 1 << log_big
    half = big // 2
    blowup = 1 << config.log_blowup
    shift = _coset_shift()

    if program is not None:
        if prog_pub is None:
            return False
        expected = preprocess_program(list(program.code), log_n, config)
        if (list(prog_pub["root"]) != expected["root"]
                or int(prog_pub["entry"]) != int(program.header.entry_point)
                or int(prog_pub["n_code"]) != len(program.code)):
            return False
    if prog_pub is not None and not range_lookup:
        return False

    aux_pre = preprocess_aux(log_n, config.log_blowup) if range_lookup \
        else None

    challenger = Challenger()
    challenger.observe(log_n)
    challenger.observe(n_cols)
    challenger.observe_many(int(x) for x in proof["trace_root"])
    if aux_pre is not None:
        # The aux-table root is recomputed from scratch (deterministic
        # per log_n), never read from the proof.
        challenger.observe_many(int(x) for x in aux_pre["root"])
    if prog_pub is not None:
        challenger.observe_many(int(x) for x in prog_pub["root"])
        challenger.observe(int(prog_pub["entry"]))
        challenger.observe(int(prog_pub["n_code"]))
    beta = None
    gamma = None
    delta = None
    eta = None
    from .constraints import N_CR_SUMS

    n_sums = (NUM_LOOKUP + NUM_AUX + 4 + N_CR_SUMS
              + (1 if prog_pub is not None else 0))
    d_init = (0, 0, 0, 0)
    d_io = (0, 0, 0, 0)
    d_cr = (0, 0, 0, 0)
    io_pub = proof.get("io")
    crypto_pub = proof.get("crypto")
    if range_lookup:
        if (not isinstance(io_pub, dict) or "inputs" not in io_pub
                or "outputs" not in io_pub):
            return False
        if not isinstance(crypto_pub, list):
            return False
        io_inputs = [int(v) for v in io_pub["inputs"]]
        io_outputs = [int(v) for v in io_pub["outputs"]]
        _observe_io(challenger, io_inputs, io_outputs)
        _observe_crypto(challenger, crypto_pub)
        beta = challenger.sample_qm31()
        if prog_pub is not None:
            gamma = challenger.sample_qm31()
        delta = challenger.sample_qm31()
        eta = challenger.sample_qm31()
        challenger.observe_many(int(x) for x in proof["sums_root"])
        # The public init demand: recomputed from the PUBLIC program when
        # given (sound binding); absent one, a program-bound proof's
        # memory argument cannot be anchored, so fall back to zero-init
        # (unbound proofs prove zero-initialized memory only).
        d_init = memory_init_demand(program, beta, delta)
        # The public I/O demand: recomputed from the proof's CLAIMED
        # tapes — an accepted proof attests exactly these tapes.
        d_io = io_tape_demand(io_inputs, io_outputs, beta, delta)
        # The crypto demand: each claimed entry's digest is RECOMPUTED
        # from its claimed input bytes — a forged digest cannot match.
        d_cr = crypto_tape_demand(crypto_pub, beta, delta)
        if d_cr is None:
            return False
    alpha_c = challenger.sample_qm31()
    challenger.observe_many(int(x) for x in proof["quotient_root"])
    alpha_b = challenger.sample_qm31()

    if tuple(fri_proof.get("shift", (1, 0))) != tuple(shift):
        return False
    if not fri_verify(fri_proof, challenger):
        return False

    trace_root = np.asarray(proof["trace_root"], dtype=np.uint32)
    q_root = np.asarray(proof["quotient_root"], dtype=np.uint32)
    s_root = (np.asarray(proof["sums_root"], dtype=np.uint32)
              if range_lookup else None)
    aux_root = (np.asarray(aux_pre["root"], dtype=np.uint32)
                if aux_pre is not None else None)
    p_root = (np.asarray(prog_pub["root"], dtype=np.uint32)
              if prog_pub is not None else None)

    def check_opening(group, root, j, expect_width):
        entry = group.get(str(j))
        if entry is None or len(entry["row"]) != expect_width:
            return None
        digest = np.asarray(merkle.hash_row_host(entry["row"]),
                            dtype=np.uint32)
        if not merkle.verify_path(
            root, j, digest,
            [np.asarray(s, dtype=np.uint32) for s in entry["path"]],
        ):
            return None
        return entry["row"]

    for q_idx, steps in enumerate(fri_proof["queries"]):
        k = steps[0]["leaf_idx"]
        opening = proof["openings"][q_idx]
        rows: Dict[int, List[int]] = {}
        q_vals: Dict[int, Tuple[int, int]] = {}
        s_vals: Dict[int, List[int]] = {}
        a_vals: Dict[int, List[int]] = {}
        p_vals: Dict[int, List[int]] = {}
        needed = {k, (k + blowup) % big, k + half, (k + half + blowup) % big}
        for j in needed:
            row = check_opening(opening["trace"], trace_root, j, 2 * n_cols)
            qrow = check_opening(opening["quotient"], q_root, j, 8)
            if row is None or qrow is None:
                return False
            rows[j] = row
            # QM31 chunks: (chunk0_a, chunk0_b, chunk1_a, chunk1_b)
            # CM31 coordinate pairs in q_rows order.
            q_vals[j] = (tuple(qrow[0:4]), tuple(qrow[4:8]))
            if range_lookup:
                srow = check_opening(opening["sums"], s_root, j,
                                     4 * n_sums)
                if srow is None:
                    return False
                s_vals[j] = srow
                arow = check_opening(opening["aux"], aux_root, j,
                                     2 * N_AUX_COLS)
                if arow is None:
                    return False
                a_vals[j] = arow
            if prog_pub is not None:
                prow = check_opening(opening["prog"], p_root, j, 8)
                if prow is None:
                    return False
                p_vals[j] = prow

        for j, fri_value in ((k, tuple(steps[0]["lo"])),
                             (k + half, tuple(steps[0]["hi"]))):
            from ..ops.qm31 import qm31_add_scalar, \
                qm31_mul_cm31_scalar, qm31_mul_scalar

            # 1. Batch combination binds FRI layer 0 to the commitments:
            # every committed CM31 column (trace, 2*n_sums sums
            # coordinates, 4 quotient coordinates) times successive QM31
            # alpha_b powers.
            acc = (0, 0, 0, 0)
            power = (1, 0, 0, 0)
            row = rows[j]

            def _absorb(cm_col, acc, power):
                term = qm31_mul_cm31_scalar(power, cm_col)
                return (qm31_add_scalar(acc, term),
                        qm31_mul_scalar(power, alpha_b))

            for c in range(n_cols):
                acc, power = _absorb((row[2 * c], row[2 * c + 1]),
                                     acc, power)
            if range_lookup:
                for kk in range(2 * n_sums):
                    s_col = (s_vals[j][2 * kk], s_vals[j][2 * kk + 1])
                    acc, power = _absorb(s_col, acc, power)
            for qchunk in q_vals[j]:
                acc, power = _absorb((qchunk[0], qchunk[1]), acc, power)
                acc, power = _absorb((qchunk[2], qchunk[3]), acc, power)
            if acc != fri_value:
                return False

            # 2. Constraint check: Q(x_j) = Q0 + x^n Q1 must equal the
            # recomputed combination of constraints at the opened rows.
            jn = (j + blowup) % big
            lookup_args = None
            aux_args = None
            memory_args = None
            io_args = None
            crypto_args = None
            program_args = None
            if range_lookup:
                lookup_args = (s_vals[j], s_vals[jn], beta)
                aux_args = (a_vals[j], eta)
                memory_args = (delta, d_init)
                io_args = (delta, d_io)
                crypto_args = (delta, d_cr)
            if prog_pub is not None:
                program_args = (p_vals[j], gamma, int(prog_pub["entry"]))
            expected_q = quotient_value_at(
                rows[j], rows[jn], n_cols, j, log_n, config.log_blowup,
                shift, alpha_c, lookup=lookup_args, aux=aux_args,
                program=program_args, memory=memory_args, io=io_args,
                crypto=crypto_args)
            x = cm31_mul_scalar(
                shift, cm31_pow_scalar(root_of_unity(log_big), j))
            xn = cm31_pow_scalar(x, 1 << log_n)
            q_at = qm31_add_scalar(
                q_vals[j][0], qm31_mul_cm31_scalar(q_vals[j][1], xn))
            if q_at != expected_q:
                return False

    return True
