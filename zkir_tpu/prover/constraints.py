"""AIR constraints over the trace matrix and quotient evaluation.

Constraint set:

  single-row (vanishing on all of H, divisor Z_H = x^n - 1):
    S1/S2: r0 value limbs == 0
    S3/S4: is_seq, pc_carry boolean
    opcode decode binding: 50 selector booleans, sum(sel) = 1,
      sum(code_j * sel_j) = opcode  (=> opcode is a valid code and the
      per-op selectors are sound degree-1 polynomials)
    rd one-hot binding: 16 booleans, sum(e) = 1, sum(i * e_i) = rd
  transition (divisor Z_trans = Z_H / (x - w_n^{n-1})):
    T1: is_seq * (pc'_lo - pc_lo - 4 + carry * 2^20)
    T2: is_seq * (pc'_hi - pc_hi - carry)
    register-file write consistency, per register r in 1..15 and limb:
      (1 - w * e_r - sel_ECALL) * (reg_r' - reg_r)
      where w = sum of selectors of rd-writing opcodes and the sel_ECALL
      exemption applies to R10 only (the syscall result register).  The
      committed register columns are the canonical value view
      (prover/trace.py), so deferred-model normalization never changes
      them and the only legitimate change is the executed write.
  first-row boundary (divisor Z_first = x - 1):
    registers 1..15 start at zero (both limbs).

Primed columns are next-row values (rotation by 2^log_blowup on the coset
LDE: trace(g_n * x)).  The quotient

    Q(x) = sum_j alpha^j C_j(x) / D_j(x)

is a polynomial of degree < 2n iff every constraint holds (degree <= 3
constraints with blowup 4); it is committed in two degree-< n chunks and
batched into FRI alongside the trace columns.

(The is_seq selector is additionally bound to the opcode by the 5th
LogUp channel when range_lookup is on.  Remaining gaps: linking ALU
result values and memory-consistency arguments — see
IMPLEMENTATION_STATUS.md.)

Evaluation runs on the *coset* LDE so Z_H is invertible at every committed
point.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.field_ops import m31_inv as m31_inv_vec, m31_mul, m31_sub
from ..ops.ntt import (
    cm31_add,
    cm31_inv_scalar,
    cm31_mul,
    cm31_mul_scalar,
    cm31_pow_scalar,
    cm31_sub,
    root_of_unity,
    _twiddle_table,
)
from ..spec.field import M31_PRIME

P = M31_PRIME

from .trace import N_COLUMNS, N_OPS, OP_VALUES

# Column indices (see prover/trace.py layout).
COL_PC_LO = 0
COL_PC_HI = 1
COL_RD = 3
COL_REG_LO = 8           # 16 reg value-lo columns 8..23
COL_REG_HI = 24          # 16 reg value-hi columns 24..39
COL_R0_LIMB0 = 8
COL_R0_LIMB1 = 24
COL_IS_SEQ = 45
COL_PC_CARRY = 46
COL_CHUNK0 = 47          # 4 range-check chunk columns 47..50
COL_SEL0 = 51            # 50 opcode one-hot selector columns 51..100
COL_RD1H0 = 51 + N_OPS   # 16 rd one-hot columns 101..116
# Lookup columns appended by the prover when range_lookup is enabled:
COL_TABLE = N_COLUMNS        # table values t_i
COL_MULT0 = N_COLUMNS + 1    # 5 multiplicity columns

# Opcodes that write their rd register: everything except stores
# (0x38-0x3B), branches (0x40-0x45), ECALL (0x50) and EBREAK (0x51)
# (dispatch families in execute.rs / interp/columnar.py).
WRITING_OPS = frozenset(
    v for v in OP_VALUES
    if not (0x38 <= v <= 0x3B or 0x40 <= v <= 0x45 or v in (0x50, 0x51)))
OP_ECALL = 0x50

NUM_SINGLE = 4 + N_OPS + 2 + 16 + 2
NUM_TRANS = 2 + 30
NUM_FIRST = 30           # boundary: registers start zeroed
NUM_CONSTRAINTS = NUM_SINGLE + NUM_TRANS + NUM_FIRST
NUM_LOOKUP = 5           # 4 chunk channels + the is_seq derivation channel
COL_OPCODE = 2

# The is_seq selector is DERIVED from the opcode by the 5th lookup channel:
# with banked opcode numbering, sequential ops are exactly op < 0x40, so
#     w = 16*op - 1024*(1 - is_seq)
# lands in the 10-bit table iff (is_seq = 1 and op < 0x40) or
# (is_seq = 0 and 0x40 <= op < 0x80).  Padding rows carry op = 0x51
# (EBREAK — "a halted machine keeps halting"), keeping them in-table.


def _cm31_inv_vec(a: Tuple[jnp.ndarray, jnp.ndarray]):
    """Vectorized CM31 inverse: conj(a) / |a|^2 (per-element Fermat)."""
    ar, ai = a
    norm = (m31_mul(ar, ar) + m31_mul(ai, ai)) % jnp.uint32(P)
    ninv = m31_inv_vec(norm)
    return (m31_mul(ar, ninv),
            m31_mul((jnp.uint32(P) - ai) % jnp.uint32(P), ninv))


def _scalar_vec(value: Tuple[int, int], n: int):
    return (jnp.full(n, value[0], dtype=jnp.uint32),
            jnp.full(n, value[1], dtype=jnp.uint32))


def constraint_evals(ext_r, ext_i, log_n: int, log_blowup: int):
    """Evaluate every constraint on the LDE domain.

    ext_r/ext_i: uint32 [n_cols, N].  Returns a list of CM31 vectors,
    singles first then transitions.
    """
    blowup = 1 << log_blowup

    def col(c):
        return (ext_r[c], ext_i[c])

    def nxt(c):
        return (jnp.roll(ext_r[c], -blowup), jnp.roll(ext_i[c], -blowup))

    big = ext_r.shape[1]
    one = _scalar_vec((1, 0), big)
    four = _scalar_vec((4, 0), big)
    two20 = _scalar_vec((1 << 20, 0), big)

    s_seq = col(COL_IS_SEQ)
    carry = col(COL_PC_CARRY)

    singles = [
        col(COL_R0_LIMB0),
        col(COL_R0_LIMB1),
        cm31_mul(s_seq, cm31_sub(s_seq, one)),
        cm31_mul(carry, cm31_sub(carry, one)),
    ]

    # Opcode one-hot decode binding: booleans, sum to 1, weighted sum
    # equals the opcode column (=> opcode is one of the 50 valid codes).
    sel = [col(COL_SEL0 + j) for j in range(N_OPS)]
    for s in sel:
        singles.append(cm31_mul(s, cm31_sub(s, one)))
    sel_sum = sel[0]
    op_sum = cm31_mul(sel[0], _scalar_vec((OP_VALUES[0], 0), big))
    for j in range(1, N_OPS):
        sel_sum = cm31_add(sel_sum, sel[j])
        op_sum = cm31_add(op_sum, cm31_mul(
            sel[j], _scalar_vec((OP_VALUES[j], 0), big)))
    singles.append(cm31_sub(sel_sum, one))
    singles.append(cm31_sub(op_sum, col(COL_OPCODE)))

    # rd one-hot binding.
    e = [col(COL_RD1H0 + i) for i in range(16)]
    for ei in e:
        singles.append(cm31_mul(ei, cm31_sub(ei, one)))
    e_sum = e[0]
    rd_sum = _scalar_vec((0, 0), big)
    for i in range(1, 16):
        e_sum = cm31_add(e_sum, e[i])
        rd_sum = cm31_add(rd_sum, cm31_mul(e[i], _scalar_vec((i, 0), big)))
    singles.append(cm31_sub(e_sum, one))
    singles.append(cm31_sub(rd_sum, col(COL_RD)))

    pc_lo, pc_hi = col(COL_PC_LO), col(COL_PC_HI)
    pc_lo_n, pc_hi_n = nxt(COL_PC_LO), nxt(COL_PC_HI)
    t1_inner = cm31_add(
        cm31_sub(cm31_sub(pc_lo_n, pc_lo), four),
        cm31_mul(carry, two20),
    )
    t2_inner = cm31_sub(cm31_sub(pc_hi_n, pc_hi), carry)
    transitions = [
        cm31_mul(s_seq, t1_inner),
        cm31_mul(s_seq, t2_inner),
    ]

    # Register-file write consistency: register r may change into the next
    # row only if this row writes it (w * e_r, both one-hot-derived) or is
    # an ECALL writing R10 (the syscall result register, syscall.rs:94-97;
    # READ results, status codes — crypto syscalls write memory and an R14
    # *bound*, never an R14 value).  Degree 3.
    w = None
    for j, v in enumerate(OP_VALUES):
        if v in WRITING_OPS:
            w = sel[j] if w is None else cm31_add(w, sel[j])
    sel_ecall = sel[OP_VALUES.index(OP_ECALL)]
    for r in range(1, 16):
        allow = cm31_mul(w, e[r])
        if r == 10:
            allow = cm31_add(allow, sel_ecall)
        factor = cm31_sub(one, allow)
        for base in (COL_REG_LO, COL_REG_HI):
            delta = cm31_sub(nxt(base + r), col(base + r))
            transitions.append(cm31_mul(factor, delta))

    # Boundary: the machine starts with a zeroed register file.
    firsts = [col(base + r)
              for r in range(1, 16) for base in (COL_REG_LO, COL_REG_HI)]
    return singles, transitions, firsts


@functools.lru_cache(maxsize=None)
def _vanishing_tables(log_n: int, log_blowup: int, shift: Tuple[int, int]):
    """1/Z_H, 1/Z_trans, 1/Z_first, 1/Z_last on the coset LDE domain
    (numpy uint32 pairs).

    Z_H(x) = x^n - 1 cycles with period 2^log_blowup on the domain (since
    x_k^n = shift^n * w_b^k with w_b of order blowup); Z_trans divides out
    the last-row factor (x - w_n^{n-1}); Z_first = x - 1 and
    Z_last = x - w_n^{n-1} are the single-row boundary divisors."""
    n = 1 << log_n
    big = 1 << (log_n + log_blowup)
    blowup = 1 << log_blowup

    shift_n = cm31_pow_scalar(shift, n)
    w_b = root_of_unity(log_blowup)
    zh_cycle = []
    for k in range(blowup):
        val = cm31_mul_scalar(shift_n, cm31_pow_scalar(w_b, k))
        zh_cycle.append(((val[0] - 1) % P, val[1]))
    zh_r = np.tile(np.asarray([v[0] for v in zh_cycle], dtype=np.uint32),
                   big // blowup)
    zh_i = np.tile(np.asarray([v[1] for v in zh_cycle], dtype=np.uint32),
                   big // blowup)
    # zh[k] depends only on k mod blowup, so the tiling lays the cycle out
    # in domain order.

    # x_k = shift * w_N^k over the whole domain.
    twr, twi = _twiddle_table(log_n + log_blowup, inverse=False)
    xr = (twr.astype(np.uint64) * shift[0]
          + (P - twi.astype(np.uint64)) * shift[1]) % P
    xi = (twr.astype(np.uint64) * shift[1]
          + twi.astype(np.uint64) * shift[0]) % P

    last = cm31_pow_scalar(root_of_unity(log_n), n - 1)
    lr = (xr + P - last[0]) % P
    li = (xi + P - last[1]) % P
    fr = (xr + P - 1) % P
    fi = xi.copy()

    zh = (jnp.asarray(zh_r), jnp.asarray(zh_i))
    zh_inv = _cm31_inv_vec(zh)
    zlast = (jnp.asarray(lr.astype(np.uint32)),
             jnp.asarray(li.astype(np.uint32)))
    zlast_inv = _cm31_inv_vec(zlast)
    ztrans_inv = _cm31_inv_vec(cm31_mul(zh, zlast_inv))
    zfirst_inv = _cm31_inv_vec(
        (jnp.asarray(fr.astype(np.uint32)), jnp.asarray(fi.astype(np.uint32))))
    return (np.asarray(zh_inv[0]), np.asarray(zh_inv[1]),
            np.asarray(ztrans_inv[0]), np.asarray(ztrans_inv[1]),
            np.asarray(zfirst_inv[0]), np.asarray(zfirst_inv[1]),
            np.asarray(zlast_inv[0]), np.asarray(zlast_inv[1]))


def lookup_constraint_evals(ext_r, ext_i, s_ext, beta: Tuple[int, int],
                            log_blowup: int):
    """The 4 cyclic LogUp constraints on the LDE domain.

    Per chunk column k (w = chunks, m = multiplicities, t = table, S the
    phase-2 partial-sum column):

        (S' - S) (beta - w) (beta - t)  -  (beta - t)  +  m (beta - w) = 0

    Degree 3; divides by Z_H (holds cyclically on every row — the
    telescoping around the cycle IS the multiset identity).
    """
    blowup = 1 << log_blowup
    big = ext_r.shape[1]
    beta_vec = _scalar_vec(beta, big)
    t = (ext_r[COL_TABLE], ext_i[COL_TABLE])
    bt = cm31_sub(beta_vec, t)

    def channel(w, k):
        m = (ext_r[COL_MULT0 + k], ext_i[COL_MULT0 + k])
        s = (sr[k], si[k])
        s_next = (jnp.roll(sr[k], -blowup), jnp.roll(si[k], -blowup))
        bw = cm31_sub(beta_vec, w)
        lhs = cm31_mul(cm31_mul(cm31_sub(s_next, s), bw), bt)
        rhs = cm31_sub(bt, cm31_mul(m, bw))
        return cm31_sub(lhs, rhs)

    out = []
    sr, si = s_ext
    for k in range(4):
        w = (ext_r[COL_CHUNK0 + k], ext_i[COL_CHUNK0 + k])
        out.append(channel(w, k))
    # Channel 4: derived is_seq witness w = 16*op - 1024*(1 - is_seq).
    op_col = (ext_r[COL_OPCODE], ext_i[COL_OPCODE])
    s_seq = (ext_r[COL_IS_SEQ], ext_i[COL_IS_SEQ])
    sixteen = _scalar_vec((16, 0), big)
    k1024 = _scalar_vec((1024, 0), big)
    w_seq = cm31_add(
        cm31_sub(cm31_mul(sixteen, op_col), k1024),
        cm31_mul(k1024, s_seq))
    out.append(channel(w_seq, 4))
    return out


def quotient_evals(ext_r, ext_i, log_n: int, log_blowup: int,
                   shift: Tuple[int, int], alpha: Tuple[int, int],
                   lookup=None):
    """Q(x) = sum_j alpha^j C_j(x) / D_j(x) on the coset LDE domain.

    ``lookup``: optional (s_ext, beta) enabling the LogUp constraints.
    """
    singles, transitions, firsts = constraint_evals(
        ext_r, ext_i, log_n, log_blowup)
    (zh_inv_r, zh_inv_i, zt_inv_r, zt_inv_i,
     zf_inv_r, zf_inv_i, zl_inv_r, zl_inv_i) = _vanishing_tables(
        log_n, log_blowup, tuple(shift))
    zh_inv = (jnp.asarray(zh_inv_r), jnp.asarray(zh_inv_i))
    zt_inv = (jnp.asarray(zt_inv_r), jnp.asarray(zt_inv_i))
    zf_inv = (jnp.asarray(zf_inv_r), jnp.asarray(zf_inv_i))

    big = ext_r.shape[1]
    acc = (jnp.zeros(big, dtype=jnp.uint32), jnp.zeros(big, dtype=jnp.uint32))
    power = (1, 0)
    for c in singles:
        term = cm31_mul(cm31_mul(c, zh_inv), _scalar_vec(power, big))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)
    for c in transitions:
        term = cm31_mul(cm31_mul(c, zt_inv), _scalar_vec(power, big))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)
    for c in firsts:
        term = cm31_mul(cm31_mul(c, zf_inv), _scalar_vec(power, big))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)
    if lookup is not None:
        s_ext, beta = lookup
        for c in lookup_constraint_evals(ext_r, ext_i, s_ext, beta,
                                         log_blowup):
            term = cm31_mul(cm31_mul(c, zh_inv), _scalar_vec(power, big))
            acc = cm31_add(acc, term)
            power = cm31_mul_scalar(power, alpha)
        # Table-pinning constraints: t is the monotone 0..1023 staircase.
        zl_inv = (jnp.asarray(zl_inv_r), jnp.asarray(zl_inv_i))
        blowup = 1 << log_blowup
        one = _scalar_vec((1, 0), big)
        t = (ext_r[COL_TABLE], ext_i[COL_TABLE])
        t_next = (jnp.roll(ext_r[COL_TABLE], -blowup),
                  jnp.roll(ext_i[COL_TABLE], -blowup))
        dt = cm31_sub(t_next, t)
        stair = cm31_mul(dt, cm31_sub(dt, one))
        t_last_c = cm31_sub(t, _scalar_vec((1023, 0), big))
        for c, dinv in ((t, zf_inv), (stair, zt_inv), (t_last_c, zl_inv)):
            term = cm31_mul(cm31_mul(c, dinv), _scalar_vec(power, big))
            acc = cm31_add(acc, term)
            power = cm31_mul_scalar(power, alpha)
    return acc


# ============================================================================
# Verifier-side scalar evaluation at one point
# ============================================================================


def constraint_value_at(row: List[int], next_row: List[int], n_cols: int):
    """Scalar C_j values from an opened row pair (CM31 tuples: the row
    layout is [re x n_cols, im x n_cols])."""

    def cval(cols, c):
        return (cols[c], cols[n_cols + c])

    s_seq = cval(row, COL_IS_SEQ)
    carry = cval(row, COL_PC_CARRY)
    one = (1, 0)
    singles = [
        cval(row, COL_R0_LIMB0),
        cval(row, COL_R0_LIMB1),
        cm31_mul_scalar(s_seq, _sub2(s_seq, one)),
        cm31_mul_scalar(carry, _sub2(carry, one)),
    ]

    sel = [cval(row, COL_SEL0 + j) for j in range(N_OPS)]
    for s in sel:
        singles.append(cm31_mul_scalar(s, _sub2(s, one)))
    sel_sum, op_sum = (0, 0), (0, 0)
    for j in range(N_OPS):
        sel_sum = _add2(sel_sum, sel[j])
        op_sum = _add2(op_sum, cm31_mul_scalar(sel[j], (OP_VALUES[j], 0)))
    singles.append(_sub2(sel_sum, one))
    singles.append(_sub2(op_sum, cval(row, COL_OPCODE)))

    e = [cval(row, COL_RD1H0 + i) for i in range(16)]
    for ei in e:
        singles.append(cm31_mul_scalar(ei, _sub2(ei, one)))
    e_sum, rd_sum = (0, 0), (0, 0)
    for i in range(16):
        e_sum = _add2(e_sum, e[i])
        rd_sum = _add2(rd_sum, cm31_mul_scalar(e[i], (i, 0)))
    singles.append(_sub2(e_sum, one))
    singles.append(_sub2(rd_sum, cval(row, COL_RD)))

    pc_lo = cval(row, COL_PC_LO)
    pc_hi = cval(row, COL_PC_HI)
    pc_lo_n = cval(next_row, COL_PC_LO)
    pc_hi_n = cval(next_row, COL_PC_HI)
    t1 = _add2(_sub2(_sub2(pc_lo_n, pc_lo), (4, 0)),
               cm31_mul_scalar(carry, (1 << 20, 0)))
    t2 = _sub2(_sub2(pc_hi_n, pc_hi), carry)
    transitions = [
        cm31_mul_scalar(s_seq, t1),
        cm31_mul_scalar(s_seq, t2),
    ]

    w = (0, 0)
    for j, v in enumerate(OP_VALUES):
        if v in WRITING_OPS:
            w = _add2(w, sel[j])
    sel_ecall = sel[OP_VALUES.index(OP_ECALL)]
    for r in range(1, 16):
        allow = cm31_mul_scalar(w, e[r])
        if r == 10:
            allow = _add2(allow, sel_ecall)
        factor = _sub2(one, allow)
        for base in (COL_REG_LO, COL_REG_HI):
            delta = _sub2(cval(next_row, base + r), cval(row, base + r))
            transitions.append(cm31_mul_scalar(factor, delta))

    firsts = [cval(row, base + r)
              for r in range(1, 16) for base in (COL_REG_LO, COL_REG_HI)]
    return singles, transitions, firsts


def lookup_constraint_values_at(row, next_row, s_row, s_next, n_cols: int,
                                beta: Tuple[int, int]):
    """Scalar LogUp constraint values from opened rows.

    ``s_row``/``s_next`` are the opened partial-sum rows: CM31 layout
    [re x 4, im x 4]."""

    def cval(cols, c):
        return (cols[c], cols[n_cols + c])

    def sval(cols, k):
        return (cols[k], cols[NUM_LOOKUP + k])

    t = cval(row, COL_TABLE)
    bt = _sub2(beta, t)

    def channel(w, k):
        m = cval(row, COL_MULT0 + k)
        s = sval(s_row, k)
        s_n = sval(s_next, k)
        bw = _sub2(beta, w)
        lhs = cm31_mul_scalar(cm31_mul_scalar(_sub2(s_n, s), bw), bt)
        rhs = _sub2(bt, cm31_mul_scalar(m, bw))
        return _sub2(lhs, rhs)

    out = []
    for k in range(4):
        out.append(channel(cval(row, COL_CHUNK0 + k), k))
    op_col = cval(row, COL_OPCODE)
    s_seq = cval(row, COL_IS_SEQ)
    w_seq = _add2(
        _sub2(cm31_mul_scalar((16, 0), op_col), (1024, 0)),
        cm31_mul_scalar((1024, 0), s_seq))
    out.append(channel(w_seq, 4))
    return out


def quotient_value_at(row, next_row, n_cols: int, index: int, log_n: int,
                      log_blowup: int, shift: Tuple[int, int],
                      alpha: Tuple[int, int], lookup=None):
    """Scalar Q(x_index) recomputed from opened rows (verifier side).

    ``lookup``: optional (s_row, s_next, beta)."""
    n = 1 << log_n
    singles, transitions, firsts = constraint_value_at(row, next_row, n_cols)
    x = cm31_mul_scalar(shift,
                        cm31_pow_scalar(root_of_unity(log_n + log_blowup),
                                        index))
    zh = _sub2(cm31_pow_scalar(x, n), (1, 0))
    last = cm31_pow_scalar(root_of_unity(log_n), n - 1)
    ztrans = cm31_mul_scalar(zh, cm31_inv_scalar(_sub2(x, last)))

    zh_inv = cm31_inv_scalar(zh)
    zt_inv = cm31_inv_scalar(ztrans)
    zf_inv = cm31_inv_scalar(_sub2(x, (1, 0)))
    acc = (0, 0)
    power = (1, 0)
    for c in singles:
        acc = _add2(acc, cm31_mul_scalar(cm31_mul_scalar(c, zh_inv), power))
        power = cm31_mul_scalar(power, alpha)
    for c in transitions:
        acc = _add2(acc, cm31_mul_scalar(cm31_mul_scalar(c, zt_inv), power))
        power = cm31_mul_scalar(power, alpha)
    for c in firsts:
        acc = _add2(acc, cm31_mul_scalar(cm31_mul_scalar(c, zf_inv), power))
        power = cm31_mul_scalar(power, alpha)
    if lookup is not None:
        s_row, s_next, beta = lookup
        for c in lookup_constraint_values_at(row, next_row, s_row, s_next,
                                             n_cols, beta):
            acc = _add2(acc, cm31_mul_scalar(
                cm31_mul_scalar(c, zh_inv), power))
            power = cm31_mul_scalar(power, alpha)
        # Table-pinning constraints.
        zl_inv = cm31_inv_scalar(_sub2(x, last))
        t = (row[COL_TABLE], row[n_cols + COL_TABLE])
        t_n = (next_row[COL_TABLE], next_row[n_cols + COL_TABLE])
        dt = _sub2(t_n, t)
        stair = cm31_mul_scalar(dt, _sub2(dt, (1, 0)))
        t_last_c = _sub2(t, (1023, 0))
        for c, dinv in ((t, zf_inv), (stair, zt_inv), (t_last_c, zl_inv)):
            acc = _add2(acc, cm31_mul_scalar(
                cm31_mul_scalar(c, dinv), power))
            power = cm31_mul_scalar(power, alpha)
    return acc


def _add2(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def _sub2(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)
