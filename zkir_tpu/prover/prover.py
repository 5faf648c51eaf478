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
    """Fill the (cell, clk)-sorted memory UPDATE table (trace.py
    M_BASE..M_BASE+25) in place: one row per load/store exec row (any
    width) carrying (cell key, clk+1, old cell bytes, new cell bytes),
    plus one clk-0 init row per nonzero code/data cell of the public
    program, sorted by (addr_hi, q, clk); padding rows continue the last
    cell's run as no-op updates (old = new = last bytes, clk advancing).
    Gap chunks cha/chb/chc (3 x 10 bits -> gaps < 2^30) witness the
    strict increase of clk within a run and of the cell key between
    runs."""
    from .constraints import (COL_CLK, COL_MEM_ADDR_HI, COL_MQA, COL_MQB,
                              COL_NB0, COL_OB0, COL_OPCODE, LOAD_OPS,
                              M_AHI, M_CHA, M_CHB, M_CHC, M_CLK, M_HIEQ,
                              M_NB0, M_OB0, M_QA, M_QB, M_REAL, M_SAME,
                              STORE_OPS)

    n = padded.shape[0]
    op = padded[:n_real, COL_OPCODE]
    rows = np.nonzero(np.isin(op, LOAD_OPS + STORE_OPS))[0]
    init = _initial_cells(program)
    k = len(rows) + len(init)
    if k > n:
        raise ValueError(
            f"memory table needs {k} rows (exec memory ops + program "
            f"init cells) but the padded trace has only {n}; re-prove "
            "with a larger padding size")

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
        t_clk[:ke] = padded[rows, COL_CLK].astype(np.int64) + 1
        for j in range(8):
            t_ob[:ke, j] = padded[rows, COL_OB0 + j]
            t_nb[:ke, j] = padded[rows, COL_NB0 + j]
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


def _mem_tuple_components(padded: np.ndarray):
    """(exec components [19, n], table components [19, n]) of the memory
    update tuples: (q, addr_hi, clk(+1), ob0-7, nb0-7)."""
    from .constraints import (COL_CLK, COL_MEM_ADDR_HI, COL_MQA, COL_MQB,
                              COL_NB0, COL_OB0, M_AHI, M_CLK, M_NB0,
                              M_OB0, M_QA, M_QB)

    q_e = (padded[:, COL_MQA].astype(np.uint64)
           + (padded[:, COL_MQB].astype(np.uint64) << 10))
    w = [q_e, padded[:, COL_MEM_ADDR_HI].astype(np.uint64),
         padded[:, COL_CLK].astype(np.uint64) + 1]
    w += [padded[:, COL_OB0 + j].astype(np.uint64) for j in range(8)]
    w += [padded[:, COL_NB0 + j].astype(np.uint64) for j in range(8)]
    q_t = (padded[:, M_QA].astype(np.uint64)
           + (padded[:, M_QB].astype(np.uint64) << 10))
    t = [q_t, padded[:, M_AHI].astype(np.uint64),
         padded[:, M_CLK].astype(np.uint64)]
    t += [padded[:, M_OB0 + j].astype(np.uint64) for j in range(8)]
    t += [padded[:, M_NB0 + j].astype(np.uint64) for j in range(8)]
    return w, t


def _delta_compress_np(components, delta):
    """CM31 delta-compression of a component list (uint64 arrays)."""
    wr = components[0] % P
    wi = np.zeros_like(wr)
    pw = delta
    for c in components[1:]:
        wr = (wr + (c % P) * (pw[0] % P)) % P
        wi = (wi + (c % P) * (pw[1] % P)) % P
        pw = cm31_mul_scalar(pw, delta)
    return wr, wi


def memory_init_demand(program, beta, delta):
    """The verifier-computable init-demand scalar: sum over the public
    program's nonzero code/data cells of 1/(beta - compress(cell tuple))
    where the tuple is (q, addr_hi, clk=0, old bytes=0, new bytes=cell
    bytes) — the clk-0 init rows the prover placed in the table.
    Returns a CM31 pair; (0, 0) when there is no program."""
    init = _initial_cells(program)
    if not init:
        return (0, 0)
    cells = sorted(init.items())
    m = len(cells)
    comp = [np.zeros(m, dtype=np.uint64) for _ in range(19)]
    for i, (cell, value) in enumerate(cells):
        comp[0][i] = cell & 0x1FFFF
        comp[1][i] = cell >> 17
        for j in range(8):
            comp[11 + j][i] = (value >> (8 * j)) & 0xFF
    t_r, t_i = _delta_compress_np(comp, delta)
    from ..ops.field_ops import m31_batch_inv
    dr = (beta[0] - t_r.astype(np.int64)) % P
    di = (beta[1] - t_i.astype(np.int64)) % P
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    return (int(inv_r.sum() % P), int(inv_i.sum() % P))


def _memory_partial_sum(padded: np.ndarray, beta, delta):
    """The memory-update multiset partial-sum column (CM31 pair [n]):

    s[0] = 0; s[i+1] = s[i] + v_i/(beta - w_i) - real_i/(beta - t_i)

    where w/t delta-compress the 19-component exec-row and table update
    tuples; the telescope closes against -d_init at the last row
    (boundary constraint, constraints.memory_multiset)."""
    from ..ops.field_ops import m31_batch_inv

    from .constraints import COL_OPCODE, LOAD_OPS, M_REAL, STORE_OPS

    n = padded.shape[0]
    w_comp, t_comp = _mem_tuple_components(padded)
    w_r, w_i = _delta_compress_np(w_comp, delta)
    t_r, t_i = _delta_compress_np(t_comp, delta)
    op = padded[:, COL_OPCODE]
    v = np.isin(op, LOAD_OPS + STORE_OPS).astype(np.uint64)
    real = padded[:, M_REAL].astype(np.uint64)

    dr = np.concatenate([(beta[0] - w_r.astype(np.int64)) % P,
                         (beta[0] - t_r.astype(np.int64)) % P])
    di = np.concatenate([(beta[1] - w_i.astype(np.int64)) % P,
                         (beta[1] - t_i.astype(np.int64)) % P])
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    term_r = ((v * inv_r[:n]) % P + (P - (real * inv_r[n:]) % P)) % P
    term_i = ((v * inv_i[:n]) % P + (P - (real * inv_i[n:]) % P)) % P
    cum_r = np.cumsum(term_r.astype(np.int64)) % P
    cum_i = np.cumsum(term_i.astype(np.int64)) % P
    s_r = np.zeros(n, dtype=np.uint32)
    s_i = np.zeros(n, dtype=np.uint32)
    s_r[1:] = cum_r[:-1].astype(np.uint32)
    s_i[1:] = cum_i[:-1].astype(np.uint32)
    # S (partial sums, exclusive) and F (the per-row terms, their own
    # committed column so the boundary constraints stay degree <= 1).
    return (s_r, s_i), (term_r.astype(np.uint32), term_i.astype(np.uint32))


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
    Returns a CM31 pair; (0, 0) for empty tapes."""
    entries = ([(1, i, v) for i, v in enumerate(inputs)]
               + [(2, j, v) for j, v in enumerate(outputs)])
    if not entries:
        return (0, 0)
    m = len(entries)
    comp = [np.zeros(m, dtype=np.uint64) for _ in range(4)]
    for r, (tag, idx, v) in enumerate(entries):
        comp[0][r] = tag
        comp[1][r] = idx
        comp[2][r] = v & 0xFFFFF
        comp[3][r] = (v >> 20) & 0xFFFFF
    t_r, t_i = _delta_compress_np(comp, delta)
    from ..ops.field_ops import m31_batch_inv
    dr = (beta[0] - t_r.astype(np.int64)) % P
    di = (beta[1] - t_i.astype(np.int64)) % P
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    return (int(inv_r.sum() % P), int(inv_i.sum() % P))


def _io_partial_sum(padded: np.ndarray, beta, delta):
    """The I/O multiset partial-sum (S, exclusive) and per-row term (F)
    columns (CM31 pairs, [n] each): F_i = erd_i/(beta - wr_i)
    + ewr_i/(beta - ww_i) with wr/ww the delta-compressed READ/WRITE
    tuples of constraints.io_multiset."""
    from ..ops.field_ops import m31_batch_inv

    from .constraints import COL_ERD, COL_EWR, COL_RIDX, COL_WIDX

    n = padded.shape[0]
    wr_comp = [np.ones(n, dtype=np.uint64),
               padded[:, COL_RIDX].astype(np.uint64),
               np.roll(padded[:, 8 + 10], -1).astype(np.uint64),
               np.roll(padded[:, 24 + 10], -1).astype(np.uint64)]
    ww_comp = [np.full(n, 2, dtype=np.uint64),
               padded[:, COL_WIDX].astype(np.uint64),
               padded[:, 8 + 11].astype(np.uint64),
               padded[:, 24 + 11].astype(np.uint64)]
    wr_r, wr_i = _delta_compress_np(wr_comp, delta)
    ww_r, ww_i = _delta_compress_np(ww_comp, delta)
    erd = padded[:, COL_ERD].astype(np.uint64)
    ewr = padded[:, COL_EWR].astype(np.uint64)

    dr = np.concatenate([(beta[0] - wr_r.astype(np.int64)) % P,
                         (beta[0] - ww_r.astype(np.int64)) % P])
    di = np.concatenate([(beta[1] - wr_i.astype(np.int64)) % P,
                         (beta[1] - ww_i.astype(np.int64)) % P])
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    term_r = ((erd * inv_r[:n]) % P + (ewr * inv_r[n:]) % P) % P
    term_i = ((erd * inv_i[:n]) % P + (ewr * inv_i[n:]) % P) % P
    cum_r = np.cumsum(term_r.astype(np.int64)) % P
    cum_i = np.cumsum(term_i.astype(np.int64)) % P
    s_r = np.zeros(n, dtype=np.uint32)
    s_i = np.zeros(n, dtype=np.uint32)
    s_r[1:] = cum_r[:-1].astype(np.uint32)
    s_i[1:] = cum_i[:-1].astype(np.uint32)
    return (s_r, s_i), (term_r.astype(np.uint32), term_i.astype(np.uint32))


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


def _build_partial_sums(padded: np.ndarray, beta):
    """The LogUp partial-sum columns on the trace domain (CM31 pairs),
    one per channel, fully vectorized:

    s_k[0] = 0; s_k[i+1 mod n] = s_k[i] + 1/(beta - w_k[i]) - m_k[i]/(beta - t_i).
    """
    from ..ops.field_ops import m31_batch_inv, m31_mul

    import jax.numpy as jnp

    from .constraints import CHANNELS, COL_MULT0, COL_TABLE

    n = padded.shape[0]
    n_ch = len(CHANNELS)
    witnesses = _channel_witnesses(padded)          # [n_ch, n]
    t = padded[:, COL_TABLE].astype(np.uint64)
    m = np.stack([padded[:, COL_MULT0 + k] for k in range(n_ch)]) \
        .astype(np.uint64)                          # [n_ch, n]

    # 1/(beta - w) and 1/(beta - t) in CM31 via one batched M31 inversion:
    # 1/(a + bi) = (a - bi) / (a^2 + b^2).
    br, bi = beta[0] % P, beta[1] % P
    dr = np.concatenate([(br - witnesses.astype(np.int64)) % P,
                         ((br - t.astype(np.int64)) % P)[None, :]], axis=0)
    di = np.full_like(dr, bi)
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(jnp.asarray(norm.astype(np.uint32)))
                      ).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P

    iw_r, iw_i = inv_r[:n_ch], inv_i[:n_ch]
    it_r, it_i = inv_r[n_ch], inv_i[n_ch]
    # Per-row term: 1/(beta - w) - m/(beta - t); then S = exclusive cumsum.
    term_r = (iw_r + (P - (m * it_r[None, :]) % P)) % P
    term_i = (iw_i + (P - (m * it_i[None, :]) % P)) % P
    # int64 cumsum is exact for n < 2^32 rows (terms < 2^31).
    cum_r = np.cumsum(term_r.astype(np.int64), axis=1) % P
    cum_i = np.cumsum(term_i.astype(np.int64), axis=1) % P
    s_r = np.zeros((n_ch, n), dtype=np.uint32)
    s_i = np.zeros((n_ch, n), dtype=np.uint32)
    s_r[:, 1:] = cum_r[:, :-1].astype(np.uint32)
    s_i[:, 1:] = cum_i[:, :-1].astype(np.uint32)
    return s_r, s_i


def _build_aux_partial_sums(padded: np.ndarray, aux_cols: np.ndarray,
                            beta, eta):
    """The aux-table channels' LogUp partial-sum columns (CM31 pairs,
    [NUM_AUX, n]): witness and table triples are eta-compressed
    (aux_table.py), so both sides are CM31-valued."""
    from ..ops.field_ops import m31_batch_inv

    from .constraints import AUX_CHANNELS, COL_AUXM0

    n = padded.shape[0]
    eta2 = cm31_mul_scalar(eta, eta)
    pows = ((1, 0), eta, eta2)

    def compress(component_vals):
        wr = np.zeros(n, dtype=np.uint64)
        wi = np.zeros(n, dtype=np.uint64)
        for vals, pw in zip(component_vals, pows):
            v = vals.astype(np.uint64) % P
            wr = (wr + v * (pw[0] % P)) % P
            wi = (wi + v * (pw[1] % P)) % P
        return wr, wi

    w_r = np.zeros((NUM_AUX, n), dtype=np.uint64)
    w_i = np.zeros((NUM_AUX, n), dtype=np.uint64)
    t_r = np.zeros((NUM_AUX, n), dtype=np.uint64)
    t_i = np.zeros((NUM_AUX, n), dtype=np.uint64)
    m = np.zeros((NUM_AUX, n), dtype=np.uint64)
    for k, (_, wspecs, t_base, _idx) in enumerate(AUX_CHANNELS):
        comps = []
        for terms in wspecs:
            acc = np.zeros(n, dtype=np.uint64)
            for c, coef in terms:
                acc = (acc + padded[:, c].astype(np.uint64) * coef) % P
            comps.append(acc)
        w_r[k], w_i[k] = compress(comps)
        t_r[k], t_i[k] = compress([aux_cols[t_base + j] for j in range(3)])
        m[k] = padded[:, COL_AUXM0 + k].astype(np.uint64)

    dr = np.concatenate([(beta[0] - w_r.astype(np.int64)) % P,
                         (beta[0] - t_r.astype(np.int64)) % P], axis=0)
    di = np.concatenate([(beta[1] - w_i.astype(np.int64)) % P,
                         (beta[1] - t_i.astype(np.int64)) % P], axis=0)
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    term_r = (inv_r[:NUM_AUX] + (P - (m * inv_r[NUM_AUX:]) % P)) % P
    term_i = (inv_i[:NUM_AUX] + (P - (m * inv_i[NUM_AUX:]) % P)) % P
    cum_r = np.cumsum(term_r.astype(np.int64), axis=1) % P
    cum_i = np.cumsum(term_i.astype(np.int64), axis=1) % P
    s_r = np.zeros((NUM_AUX, n), dtype=np.uint32)
    s_i = np.zeros((NUM_AUX, n), dtype=np.uint32)
    s_r[:, 1:] = cum_r[:, :-1].astype(np.uint32)
    s_i[:, 1:] = cum_i[:, :-1].astype(np.uint32)
    return s_r, s_i


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
    rows = jnp.concatenate([ext_r.T, ext_i.T], axis=1)  # [N, 8]
    levels = merkle.to_host(merkle.build_tree(merkle.hash_rows(rows)))
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
    """The program-channel LogUp partial-sum column (CM31 pair [n])."""
    from ..ops.field_ops import m31_batch_inv

    from .constraints import COL_IMM_LO, COL_PC_HI, COL_PC_LO, COL_PROG_M, \
        PROG_F_TERMS
    from ..ops.ntt import cm31_mul_scalar as _gmul

    n = padded.shape[0]
    g2 = _gmul(gamma, gamma)
    g3 = _gmul(g2, gamma)

    def tuple_vals(pc_lo, pc_hi, f, imm):
        wr = (pc_lo.astype(np.uint64)
              + pc_hi.astype(np.uint64) * gamma[0]
              + f.astype(np.uint64) * g2[0]
              + imm.astype(np.uint64) * g3[0]) % P
        wi = (pc_hi.astype(np.uint64) * gamma[1]
              + f.astype(np.uint64) * g2[1]
              + imm.astype(np.uint64) * g3[1]) % P
        return wr, wi

    f_trace = np.zeros(n, dtype=np.uint64)
    for c, coef in PROG_F_TERMS:
        f_trace = (f_trace + padded[:, c].astype(np.uint64) * coef) % P
    w_r, w_i = tuple_vals(padded[:, COL_PC_LO], padded[:, COL_PC_HI],
                          f_trace, padded[:, COL_IMM_LO])
    t_r, t_i = tuple_vals(prog_cols[0], prog_cols[1],
                          prog_cols[2].astype(np.uint64),
                          prog_cols[3])
    m = padded[:, COL_PROG_M].astype(np.uint64)

    dr = np.concatenate([(beta[0] - w_r.astype(np.int64)) % P,
                         (beta[0] - t_r.astype(np.int64)) % P])
    di = np.concatenate([(beta[1] - w_i.astype(np.int64)) % P,
                         (beta[1] - t_i.astype(np.int64)) % P])
    norm = (dr * dr + di * di) % P
    ninv = np.asarray(m31_batch_inv(
        jnp.asarray(norm.astype(np.uint32)))).astype(np.uint64)
    inv_r = (dr.astype(np.uint64) * ninv) % P
    inv_i = ((P - di.astype(np.uint64)) % P * ninv) % P
    term_r = (inv_r[:n] + (P - (m * inv_r[n:]) % P)) % P
    term_i = (inv_i[:n] + (P - (m * inv_i[n:]) % P)) % P
    cum_r = np.cumsum(term_r.astype(np.int64)) % P
    cum_i = np.cumsum(term_i.astype(np.int64)) % P
    s_r = np.zeros(n, dtype=np.uint32)
    s_i = np.zeros(n, dtype=np.uint32)
    s_r[1:] = cum_r[:-1].astype(np.uint32)
    s_i[1:] = cum_i[:-1].astype(np.uint32)
    return s_r, s_i


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
    """sum_i alpha^i col_i + sum_j alpha^(n_cols+j) extra_j over CM31."""
    n_cols = ext_r.shape[0]
    n_total = n_cols + len(extra_cols)
    pw = np.zeros((n_total, 2), dtype=np.uint32)
    power = (1, 0)
    for k in range(n_total):
        pw[k] = power
        power = cm31_mul_scalar(power, alpha)
    if extra_cols:
        ar = jnp.concatenate(
            [ext_r, jnp.stack([c[0] for c in extra_cols])], axis=0)
        ai = jnp.concatenate(
            [ext_i, jnp.stack([c[1] for c in extra_cols])], axis=0)
    else:
        ar, ai = ext_r, ext_i
    return _combine_kernel(ar, ai, jnp.asarray(pw[:, 0]),
                           jnp.asarray(pw[:, 1]))


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
        trace_rows = jnp.concatenate([ext_r.T, ext_i.T], axis=1)
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

        trace_rows = jnp.concatenate([ext_r.T, ext_i.T], axis=1)
        levels1 = merkle.to_host(
            merkle.build_tree(merkle.hash_rows(trace_rows)))
        if store is not None:
            store.save("commit", {"ext_r": np.asarray(ext_r),
                                  "ext_i": np.asarray(ext_i),
                                  "levels1": levels1})
    root1 = merkle.root(levels1)

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
    if range_lookup:
        # The claimed public I/O tapes enter the transcript before the
        # beta/delta draws (Fiat-Shamir binding of the io channel).
        io_inputs, io_outputs = extract_io(padded)
        _observe_io(challenger, io_inputs, io_outputs)

    # Phase 1.5 (lookup only): beta challenge -> partial-sum columns.
    # Sums-column layout: NUM_LOOKUP channel sums, NUM_AUX aux-table
    # channel sums, the memory multiset sum, then (if program-bound) the
    # program sum.
    lookup = None
    aux_args = None
    memory_args = None
    io_args = None
    program_args = None
    levels_s = None
    s_rows = None
    if range_lookup:
        beta = challenger.sample_cm31()
        gamma = challenger.sample_cm31() if prog is not None else None
        delta = challenger.sample_cm31()
        eta = challenger.sample_cm31()
        ck = store.load("sums") if store is not None else None
        if ck is not None:
            s_ext_r = jnp.asarray(ck["s_ext_r"])
            s_ext_i = jnp.asarray(ck["s_ext_i"])
            levels_s = ck["levels_s"]
            s_rows = jnp.concatenate([s_ext_r.T, s_ext_i.T], axis=1)
        else:
            s_r, s_i = _build_partial_sums(padded, beta)
            sa_r, sa_i = _build_aux_partial_sums(padded, aux_pre["cols"],
                                                 beta, eta)
            (sm_r, sm_i), (fm_r, fm_i) = _memory_partial_sum(padded, beta,
                                                             delta)
            (si_r, si_i), (fi_r, fi_i) = _io_partial_sum(padded, beta,
                                                         delta)
            s_r = np.concatenate([s_r, sa_r, sm_r[None, :], fm_r[None, :],
                                  si_r[None, :], fi_r[None, :]], axis=0)
            s_i = np.concatenate([s_i, sa_i, sm_i[None, :], fm_i[None, :],
                                  si_i[None, :], fi_i[None, :]], axis=0)
            if prog is not None:
                sp_r, sp_i = _program_partial_sum(padded, prog["cols"],
                                                  beta, gamma)
                s_r = np.concatenate([s_r, sp_r[None, :]], axis=0)
                s_i = np.concatenate([s_i, sp_i[None, :]], axis=0)
            s_ext_r, s_ext_i = lde(jnp.asarray(s_r), jnp.asarray(s_i),
                                   log_n, fri_config.log_blowup,
                                   shift=shift)
            s_rows = jnp.concatenate([s_ext_r.T, s_ext_i.T], axis=1)
            levels_s = merkle.to_host(
                merkle.build_tree(merkle.hash_rows(s_rows)))
            if store is not None:
                store.save("sums", {"s_ext_r": np.asarray(s_ext_r),
                                    "s_ext_i": np.asarray(s_ext_i),
                                    "levels_s": levels_s})
        root_s = merkle.root(levels_s)
        challenger.observe_many(int(x) for x in root_s)
        lookup = ((s_ext_r[:NUM_LOOKUP], s_ext_i[:NUM_LOOKUP]), beta)
        aux_args = (aux_pre["ext"],
                    (s_ext_r[NUM_LOOKUP:NUM_LOOKUP + NUM_AUX],
                     s_ext_i[NUM_LOOKUP:NUM_LOOKUP + NUM_AUX]), eta)
        i_mem = NUM_LOOKUP + NUM_AUX
        d_init = memory_init_demand(program, beta, delta)
        memory_args = (((s_ext_r[i_mem], s_ext_i[i_mem]),
                        (s_ext_r[i_mem + 1], s_ext_i[i_mem + 1])),
                       delta, d_init)
        d_io = io_tape_demand(io_inputs, io_outputs, beta, delta)
        io_args = (((s_ext_r[i_mem + 2], s_ext_i[i_mem + 2]),
                    (s_ext_r[i_mem + 3], s_ext_i[i_mem + 3])),
                   delta, d_io)
        if prog is not None:
            program_args = (prog["ext"],
                            (s_ext_r[i_mem + 4], s_ext_i[i_mem + 4]),
                            gamma, entry_point)

    alpha_c = challenger.sample_cm31()

    # Phase 2: quotient, split into degree-< n chunks
    # Q(x) = Q0(x) + x^n Q1(x) (Plonky3-style quotient chunking: keeps
    # every committed column at the same FRI degree bound while allowing
    # constraints up to degree 3).  Stage-checkpointed as "quotient".
    n_rows = 1 << log_n
    ck = store.load("quotient") if store is not None else None
    if ck is not None:
        q_chunks = [(jnp.asarray(ck["q0r"]), jnp.asarray(ck["q0i"])),
                    (jnp.asarray(ck["q1r"]), jnp.asarray(ck["q1i"]))]
        levels2 = ck["levels2"]
        q_rows = jnp.stack([q_chunks[0][0], q_chunks[0][1],
                            q_chunks[1][0], q_chunks[1][1]], axis=1)
    else:
        q = quotient_evals(ext_r, ext_i, log_n, fri_config.log_blowup,
                           shift, alpha_c, lookup=lookup, aux=aux_args,
                           program=program_args, memory=memory_args,
                           io=io_args)
        qc_r, qc_i = coset_intt(q[0], q[1], log_big, shift=shift)
        if selfcheck:
            # Completeness self-check: Q is a polynomial of degree < 2n
            # iff every constraint divides cleanly.  The chunking below
            # silently DISCARDS coefficients [2n, 4n) — a violated
            # constraint would otherwise ship as a "proof" that only
            # fails at the verifier's pointwise check.  Catch it here,
            # at prove time, with a name.
            hi_r = np.asarray(qc_r[2 * n_rows:])
            hi_i = np.asarray(qc_i[2 * n_rows:])
            if hi_r.any() or hi_i.any():
                from .constraints import diagnose_violations
                detail = diagnose_violations(
                    ext_r, ext_i, log_n, fri_config.log_blowup, shift,
                    lookup=lookup, aux=aux_args, program=program_args,
                    memory=memory_args, io=io_args)
                raise ConstraintViolation(
                    "trace violates the constraint system (quotient has "
                    f"degree >= 2n): {detail}")
        q_chunks = []
        for j in range(2):
            cr = jnp.zeros(big, dtype=jnp.uint32).at[:n_rows].set(
                qc_r[j * n_rows:(j + 1) * n_rows])
            ci = jnp.zeros(big, dtype=jnp.uint32).at[:n_rows].set(
                qc_i[j * n_rows:(j + 1) * n_rows])
            q_chunks.append(coset_ntt(cr, ci, log_big, shift=shift))
        q_rows = jnp.stack([q_chunks[0][0], q_chunks[0][1],
                            q_chunks[1][0], q_chunks[1][1]], axis=1)
        levels2 = merkle.to_host(merkle.build_tree(merkle.hash_rows(q_rows)))
        if store is not None:
            store.save("quotient", {
                "q0r": np.asarray(q_chunks[0][0]),
                "q0i": np.asarray(q_chunks[0][1]),
                "q1r": np.asarray(q_chunks[1][0]),
                "q1i": np.asarray(q_chunks[1][1]),
                "levels2": levels2})
    root2 = merkle.root(levels2)
    challenger.observe_many(int(x) for x in root2)
    alpha_b = challenger.sample_cm31()

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
        extra_cols += q_chunks
        batch_r, batch_i = _combine(ext_r, ext_i, extra_cols, alpha_b)
        fri_proof = fri_prove(batch_r, batch_i, log_big, challenger,
                              fri_config, shift=shift)
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
    n_sums = (NUM_LOOKUP + NUM_AUX + 4      # channels + mem S/F + io S/F
              + (1 if prog_pub is not None else 0))
    d_init = (0, 0)
    d_io = (0, 0)
    io_pub = proof.get("io")
    if range_lookup:
        if (not isinstance(io_pub, dict) or "inputs" not in io_pub
                or "outputs" not in io_pub):
            return False
        io_inputs = [int(v) for v in io_pub["inputs"]]
        io_outputs = [int(v) for v in io_pub["outputs"]]
        _observe_io(challenger, io_inputs, io_outputs)
        beta = challenger.sample_cm31()
        if prog_pub is not None:
            gamma = challenger.sample_cm31()
        delta = challenger.sample_cm31()
        eta = challenger.sample_cm31()
        challenger.observe_many(int(x) for x in proof["sums_root"])
        # The public init demand: recomputed from the PUBLIC program when
        # given (sound binding); absent one, a program-bound proof's
        # memory argument cannot be anchored, so fall back to zero-init
        # (unbound proofs prove zero-initialized memory only).
        d_init = memory_init_demand(program, beta, delta)
        # The public I/O demand: recomputed from the proof's CLAIMED
        # tapes — an accepted proof attests exactly these tapes.
        d_io = io_tape_demand(io_inputs, io_outputs, beta, delta)
    alpha_c = challenger.sample_cm31()
    challenger.observe_many(int(x) for x in proof["quotient_root"])
    alpha_b = challenger.sample_cm31()

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
            qrow = check_opening(opening["quotient"], q_root, j, 4)
            if row is None or qrow is None:
                return False
            rows[j] = row
            q_vals[j] = ((qrow[0], qrow[1]), (qrow[2], qrow[3]))
            if range_lookup:
                srow = check_opening(opening["sums"], s_root, j,
                                     2 * n_sums)
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
            # 1. Batch combination binds FRI layer 0 to the commitments.
            acc = (0, 0)
            power = (1, 0)
            row = rows[j]
            for c in range(n_cols):
                col = (row[c], row[n_cols + c])
                term = cm31_mul_scalar(col, power)
                acc = ((acc[0] + term[0]) % P, (acc[1] + term[1]) % P)
                power = cm31_mul_scalar(power, alpha_b)
            if range_lookup:
                for kk in range(n_sums):
                    s_col = (s_vals[j][kk], s_vals[j][n_sums + kk])
                    sterm = cm31_mul_scalar(s_col, power)
                    acc = ((acc[0] + sterm[0]) % P, (acc[1] + sterm[1]) % P)
                    power = cm31_mul_scalar(power, alpha_b)
            for qchunk in q_vals[j]:
                qterm = cm31_mul_scalar(qchunk, power)
                acc = ((acc[0] + qterm[0]) % P, (acc[1] + qterm[1]) % P)
                power = cm31_mul_scalar(power, alpha_b)
            if acc != fri_value:
                return False

            # 2. Constraint check: Q(x_j) = Q0 + x^n Q1 must equal the
            # recomputed combination of constraints at the opened rows.
            jn = (j + blowup) % big
            lookup_args = None
            aux_args = None
            memory_args = None
            io_args = None
            program_args = None
            if range_lookup:
                lookup_args = (s_vals[j], s_vals[jn], beta)
                aux_args = (a_vals[j], eta)
                memory_args = (delta, d_init)
                io_args = (delta, d_io)
            if prog_pub is not None:
                program_args = (p_vals[j], gamma, int(prog_pub["entry"]))
            expected_q = quotient_value_at(
                rows[j], rows[jn], n_cols, j, log_n, config.log_blowup,
                shift, alpha_c, lookup=lookup_args, aux=aux_args,
                program=program_args, memory=memory_args, io=io_args)
            x = cm31_mul_scalar(
                shift, cm31_pow_scalar(root_of_unity(log_big), j))
            xn = cm31_pow_scalar(x, 1 << log_n)
            q_at = cm31_mul_scalar(q_vals[j][1], xn)
            q_at = ((q_vals[j][0][0] + q_at[0]) % P,
                    (q_vals[j][0][1] + q_at[1]) % P)
            if q_at != expected_q:
                return False

    return True
