"""AIR constraints over the trace matrix and quotient evaluation.

Constraint set:

  single-row (vanishing on all of H, divisor Z_H = x^n - 1):
    S1/S2: r0 value limbs == 0
    S3/S4: is_seq, pc_carry boolean
    opcode decode binding: 50 selector booleans, sum(sel) = 1,
      sum(code_j * sel_j) = opcode  (=> opcode is a valid code and the
      per-op selectors are sound degree-1 polynomials)
    rd / rs1 / rs2 one-hot bindings: 16 booleans each, sum = 1,
      weighted sum = the bitfield column
    carry/borrow/sign booleans: c0, c1, imm_s
    immediate decomposition: imm = q0 + 2^10 q1 + 2^16 s and
      q0 = rs2 + 16 q0hi (pins the overlapping rs2 bitfield); chunk
      ranges forced by the LogUp channels
    result limb decomposition: res_lo = rl0 + 2^10 rl1 (ditto hi) with
      rl*/rh* in the 10-bit table => written register limbs < 2^20
    op-specific result pins (degree 3, operands read via rs1/rs2
      one-hot inner products over this row's register file):
        ADD : a_lo + b_lo = res_lo + 2^20 c0 ;
              a_hi + b_hi + c0 = res_hi + 2^20 c1
        SUB : a_lo - b_lo = res_lo - 2^20 c0 ;
              a_hi - b_hi - c0 = res_hi - 2^20 c1
        ADDI: ADD with b = sext17(imm) limbs
              (imm + s(2^20 - 2^17), s(2^20 - 1))
        JAL/JALR: res = pc + 4 mod 2^40
      Integer-range soundness: all terms < 2^21 << p, so the field
      identity forces the integer identity; res limbs are < 2^20 by the
      chunk lookups, operands are < 2^20 inductively (zero boundary +
      every write goes through res; ECALL/R10 is the documented hole
      until I/O values are public-input-bound).
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
    result binding, per register r in 1..15 and limb:
      w * e_r * (reg_r' - res)  -- the written value IS the committed
      result (which the pins above tie to the operands for
      ADD/SUB/ADDI/JAL/JALR; remaining ops await op-specific pins).
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

from .trace import (N_ALU_COLUMNS, N_CF_COLUMNS, N_COLUMNS,
                    N_DECODE_COLUMNS, N_OPS, OP_VALUES, WRITING_OPS)

# Column indices (see prover/trace.py layout).
COL_PC_LO = 0
COL_PC_HI = 1
COL_RD = 3
COL_RS1 = 4
COL_RS2 = 5
COL_IMM_LO = 6
COL_REG_LO = 8           # 16 reg value-lo columns 8..23
COL_REG_HI = 24          # 16 reg value-hi columns 24..39
COL_R0_LIMB0 = 8
COL_R0_LIMB1 = 24
COL_IS_SEQ = 45
COL_PC_CARRY = 46
COL_CHUNK0 = 47          # 4 range-check chunk columns 47..50
COL_SEL0 = 51            # 50 opcode one-hot selector columns 51..100
COL_RD1H0 = 51 + N_OPS   # 16 rd one-hot columns 101..116
# ALU result-binding block (prover/trace.py docstring).
COL_RS1H0 = N_DECODE_COLUMNS          # 16 rs1 one-hot columns
COL_RS2H0 = N_DECODE_COLUMNS + 16     # 16 rs2 one-hot columns
COL_RES_LO = N_DECODE_COLUMNS + 32
COL_RES_HI = N_DECODE_COLUMNS + 33
COL_CARRY0 = N_DECODE_COLUMNS + 34
COL_CARRY1 = N_DECODE_COLUMNS + 35
COL_IMM_S = N_DECODE_COLUMNS + 36
COL_IMM_Q0 = N_DECODE_COLUMNS + 37
COL_IMM_Q1 = N_DECODE_COLUMNS + 38
COL_IMM_Q0HI = N_DECODE_COLUMNS + 39
COL_RES_CH0 = N_DECODE_COLUMNS + 40   # rl0, rl1, rh0, rh1
# Control-flow block (prover/trace.py): branch/jump pc-target semantics.
COL_TAKEN = N_ALU_COLUMNS
COL_CARRY2 = N_ALU_COLUMNS + 1        # target/address lo carry, in {0,1,2}
COL_CARRY3 = N_ALU_COLUMNS + 2        # target/address hi carry (dropped)
COL_BLSB = N_ALU_COLUMNS + 3          # JALR LSB-clear witness
BRANCH_OPS = tuple(range(0x40, 0x46))
# Memory-op binding block (prover/trace.py): address-limb chunks + SW
# truncation witness.  Memory columns (base layout): 40 addr_lo,
# 41 addr_hi, 42 val_lo, 43 val_hi, 44 flags.
COL_MEM_ADDR_LO = 40
COL_MEM_ADDR_HI = 41
COL_MEM_VAL_LO = 42
COL_MEM_VAL_HI = 43
COL_MEM_FLAGS = 44
COL_MADDR_CH0 = N_CF_COLUMNS          # al0, al1, ah0, ah1
COL_SW_TW = N_CF_COLUMNS + 4
LOAD_OPS = tuple(range(0x30, 0x36))
STORE_OPS = tuple(range(0x38, 0x3C))
ZEXT_LOAD_OPS = (0x31, 0x33, 0x34, 0x35)   # LBU, LHU, LW, LD: res == mval
MEM_WIDTHS = {0x30: 1, 0x31: 1, 0x32: 2, 0x33: 2, 0x34: 4, 0x35: 8,
              0x38: 1, 0x39: 2, 0x3A: 4, 0x3B: 8}
# Memory-consistency block (prover/trace.py): exec clk + sorted table.
# v1 scope: the native-width LD/SD ops (sub-word ops keep their register
# pins above; cross-row consistency for them needs byte decomposition).
from .trace import COL_CLK, M_BASE  # noqa: E402
# Compare / branch-condition / cmov block (prover/trace.py).
from .trace import (COL_AR0, COL_AR1, COL_BR0, COL_BR1, COL_CB0,  # noqa: E402
                    COL_CB1, COL_CCH0, COL_CD0, COL_CEQ, COL_CINV,
                    COL_CU_HI, COL_CU_LO, COL_DR0, COL_E0, COL_EEX,
                    COL_EINV, COL_K0, COL_K1C, COL_K2C, COL_K3C,
                    COL_K4C, COL_K5C, COL_K6C, COL_PL0, COL_SA, COL_SB,
                    COL_U0, COL_VA_HI, COL_VA_LO, COL_VB_HI, COL_VB_LO,
                    COL_VG_HI, COL_VG_LO, COL_X1, COL_XQ0, COL_YQ0)
COMPARE_OPS = tuple(range(0x20, 0x26))   # SLTU SGEU SLT SGE SEQ SNE
CMOV_OPS = (0x26, 0x27, 0x28)            # CMOV CMOVZ CMOVNZ
M_ADDR_LO = M_BASE
M_ADDR_HI = M_BASE + 1
M_CLK = M_BASE + 2
M_VAL_LO = M_BASE + 3
M_VAL_HI = M_BASE + 4
M_W = M_BASE + 5
M_REAL = M_BASE + 6
M_SAME = M_BASE + 7
M_HIEQ = M_BASE + 8
M_CHA = M_BASE + 9
M_CHB = M_BASE + 10
MEMARG_OPS = (0x35, 0x3B)                  # LD, SD
# Lookup columns appended by the prover when range_lookup is enabled:
COL_TABLE = N_COLUMNS                 # table values t_i
COL_MULT0 = N_COLUMNS + 1             # NUM_LOOKUP multiplicity columns
# With program binding, one more phase-1 column: the program-table
# multiplicity (how often each program row executes; padding rows count
# against the halt entry).  Its partial sum is the LAST sums column.
COL_PROG_M = None                     # = COL_MULT0 + NUM_LOOKUP (below)

OP_ECALL = 0x50
COL_OPCODE = 2

# ----------------------------------------------------------------------
# LogUp channels.  Every channel witness is AFFINE in the committed
# columns: w = const + sum coef_j * col_j (mod p), and must land in the
# 10-bit staircase table [0, 1024).
#
#   chunk0-3   range-check chunk decomposition of deferred values
#   seq        is_seq derivation: 16*op - 1024*(1 - is_seq) in-table
#              iff is_seq == (op < 0x40) (banked opcode numbering)
#   imm_q0     immediate bits [0, 10)
#   imm_q1     16 * (immediate bits [10, 16)) -- forces q1 < 2^6
#   imm_q0hi   16 * (q0 bits [4, 10)) -- forces q0hi < 2^6, pinning the
#              rs2 bitfield via q0 = rs2 + 16*q0hi
#   rl0/rl1/rh0/rh1  10-bit chunks of res_lo/res_hi -- force the written
#              register limbs below 2^20
# ----------------------------------------------------------------------
CHANNELS = (
    ("chunk0", 0, ((COL_CHUNK0 + 0, 1),)),
    ("chunk1", 0, ((COL_CHUNK0 + 1, 1),)),
    ("chunk2", 0, ((COL_CHUNK0 + 2, 1),)),
    ("chunk3", 0, ((COL_CHUNK0 + 3, 1),)),
    ("seq", P - 1024, ((COL_OPCODE, 16), (COL_IS_SEQ, 1024))),
    ("imm_q0", 0, ((COL_IMM_Q0, 1),)),
    ("imm_q1", 0, ((COL_IMM_Q1, 16),)),
    ("imm_q0hi", 0, ((COL_IMM_Q0HI, 16),)),
    ("rl0", 0, ((COL_RES_CH0 + 0, 1),)),
    ("rl1", 0, ((COL_RES_CH0 + 1, 1),)),
    ("rh0", 0, ((COL_RES_CH0 + 2, 1),)),
    ("rh1", 0, ((COL_RES_CH0 + 3, 1),)),
    ("mal0", 0, ((COL_MADDR_CH0 + 0, 1),)),
    ("mal1", 0, ((COL_MADDR_CH0 + 1, 1),)),
    ("mah0", 0, ((COL_MADDR_CH0 + 2, 1),)),
    ("mah1", 0, ((COL_MADDR_CH0 + 3, 1),)),
    ("sw_tw", 0, ((COL_SW_TW, 4),)),           # 4*tw < 2^10 => tw < 2^8
    ("mem_cha", 0, ((M_CHA, 1),)),
    ("mem_chb", 0, ((M_CHB, 1),)),
    ("cch0", 0, ((COL_CCH0 + 0, 1),)),
    ("cch1", 0, ((COL_CCH0 + 1, 1),)),
    ("cch2", 0, ((COL_CCH0 + 2, 1),)),
    ("cch3", 0, ((COL_CCH0 + 3, 1),)),
    ("ar0", 0, ((COL_AR0, 1),)),
    ("ar1", 0, ((COL_AR1, 2),)),               # 2*ar1 < 2^10 => ar1 < 2^9
    ("br0", 0, ((COL_BR0, 1),)),
    ("br1", 0, ((COL_BR1, 2),)),
    # Multiply/divide block chunks (trace.py MD_BASE layout).
    ("xq0", 0, ((COL_XQ0 + 0, 1),)),
    ("xq1", 0, ((COL_XQ0 + 1, 1),)),
    ("xq2", 0, ((COL_XQ0 + 2, 1),)),
    ("xq3", 0, ((COL_XQ0 + 3, 1),)),
    ("yq0", 0, ((COL_YQ0 + 0, 1),)),
    ("yq1", 0, ((COL_YQ0 + 1, 1),)),
    ("yq2", 0, ((COL_YQ0 + 2, 1),)),
    ("yq3", 0, ((COL_YQ0 + 3, 1),)),
    ("pl0", 0, ((COL_PL0 + 0, 1),)),
    ("pl1", 0, ((COL_PL0 + 1, 1),)),
    ("pl2", 0, ((COL_PL0 + 2, 1),)),
    ("pl3", 0, ((COL_PL0 + 3, 1),)),
    ("k0", 0, ((COL_K0, 1),)),
    ("k1c", 0, ((COL_K1C, 1),)),
    ("k2c", 0, ((COL_K2C, 1),)),
    ("k3c", 0, ((COL_K3C, 1),)),
    ("k4c", 0, ((COL_K4C, 1),)),
    ("k5c", 0, ((COL_K5C, 1),)),
    ("k6c", 0, ((COL_K6C, 1),)),
    ("dr0", 0, ((COL_DR0 + 0, 1),)),
    ("dr1", 0, ((COL_DR0 + 1, 1),)),
    ("dr2", 0, ((COL_DR0 + 2, 1),)),
    ("dr3", 0, ((COL_DR0 + 3, 1),)),
    ("u0", 0, ((COL_U0 + 0, 1),)),
    ("u1", 0, ((COL_U0 + 1, 1),)),
    ("u2", 0, ((COL_U0 + 2, 1),)),
    ("u3", 0, ((COL_U0 + 3, 1),)),
)
NUM_LOOKUP = len(CHANNELS)
COL_PROG_M = COL_MULT0 + NUM_LOOKUP

# Program-binding tuple compression: with a transcript challenge gamma,
#     w_row = pc_lo + g*pc_hi + g^2*(op + 2^7 rd + 2^11 rs1) + g^3*imm
# must be a member (LogUp, shared beta) of the preprocessed table
#     t_i = prog_pc_lo + g*prog_pc_hi + g^2*(word & 0x7FFF) + g^3*(word >> 15)
# whose Merkle root the verifier recomputes from the public program.
# Every executed row is therefore a real (pc, instruction) pair of the
# program; padding rows consume the dedicated (0, 0, EBREAK, 0) entry.
PROG_F_TERMS = ((COL_OPCODE, 1), (COL_RD, 1 << 7), (COL_RS1, 1 << 11))

NUM_SINGLE = 4 + N_OPS + 2 + 16 + 2 + 36 + 3 + 4 + 8 + 4 + 13 + 42 + 3 + 39
NUM_TRANS = 2 + 30 + 30 + 6 + 4
NUM_FIRST = 30           # boundary: registers start zeroed
NUM_CONSTRAINTS = NUM_SINGLE + NUM_TRANS + NUM_FIRST

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

    # rd / rs1 / rs2 one-hot bindings.
    def onehot_block(base, field_col):
        blk = [col(base + i) for i in range(16)]
        for bi in blk:
            singles.append(cm31_mul(bi, cm31_sub(bi, one)))
        b_sum = blk[0]
        f_sum = _scalar_vec((0, 0), big)
        for i in range(1, 16):
            b_sum = cm31_add(b_sum, blk[i])
            f_sum = cm31_add(f_sum, cm31_mul(blk[i], _scalar_vec((i, 0), big)))
        singles.append(cm31_sub(b_sum, one))
        singles.append(cm31_sub(f_sum, col(field_col)))
        return blk

    e = onehot_block(COL_RD1H0, COL_RD)
    e1 = onehot_block(COL_RS1H0, COL_RS1)
    e2 = onehot_block(COL_RS2H0, COL_RS2)

    # Booleans: carries and the immediate sign bit.
    c0 = col(COL_CARRY0)
    c1 = col(COL_CARRY1)
    s_imm = col(COL_IMM_S)
    for bcol in (c0, c1, s_imm):
        singles.append(cm31_mul(bcol, cm31_sub(bcol, one)))

    # Immediate decomposition: imm = q0 + 2^10 q1 + 2^16 s, q0 = rs2 + 16 q0hi
    # (chunk ranges enforced by the lookup channels).
    q0 = col(COL_IMM_Q0)
    singles.append(cm31_sub(
        col(COL_IMM_LO),
        cm31_add(cm31_add(q0, cm31_mul(col(COL_IMM_Q1),
                                       _scalar_vec((1 << 10, 0), big))),
                 cm31_mul(s_imm, _scalar_vec((1 << 16, 0), big)))))
    singles.append(cm31_sub(
        q0, cm31_add(col(COL_RS2), cm31_mul(col(COL_IMM_Q0HI),
                                            _scalar_vec((16, 0), big)))))

    # Result limb decomposition: res = ch0 + 2^10 ch1 per limb.
    res_lo = col(COL_RES_LO)
    res_hi = col(COL_RES_HI)
    for res, c_base in ((res_lo, COL_RES_CH0), (res_hi, COL_RES_CH0 + 2)):
        singles.append(cm31_sub(
            res, cm31_add(col(c_base), cm31_mul(
                col(c_base + 1), _scalar_vec((1 << 10, 0), big)))))

    # Operand values via one-hot inner product over the register file
    # (degree 2; this row's committed registers are the pre-state).
    def operand(blk, base):
        acc = cm31_mul(blk[0], col(base))
        for i in range(1, 16):
            acc = cm31_add(acc, cm31_mul(blk[i], col(base + i)))
        return acc

    a_lo, a_hi = operand(e1, COL_REG_LO), operand(e1, COL_REG_HI)
    b_lo, b_hi = operand(e2, COL_REG_LO), operand(e2, COL_REG_HI)

    # Op-specific result pins (degree 3): res = a OP b mod 2^40 with
    # carry/borrow bits; see module docstring for the integer-range
    # soundness argument.
    sel_by = {v: sel[j] for j, v in enumerate(OP_VALUES)}
    two17 = (1 << 20) - (1 << 17)

    def pin(selector, lo_expr, hi_expr):
        singles.append(cm31_mul(selector, lo_expr))
        singles.append(cm31_mul(selector, hi_expr))

    c0_sh = cm31_mul(c0, two20)
    c1_sh = cm31_mul(c1, two20)
    # ADD: a + b = res + 2^20 c0 (lo); a_hi + b_hi + c0 = res_hi + 2^20 c1.
    pin(sel_by[0x00],
        cm31_sub(cm31_add(a_lo, b_lo), cm31_add(res_lo, c0_sh)),
        cm31_sub(cm31_add(cm31_add(a_hi, b_hi), c0),
                 cm31_add(res_hi, c1_sh)))
    # SUB: a - b = res - 2^20 c0 (borrow).
    pin(sel_by[0x01],
        cm31_sub(cm31_add(a_lo, c0_sh), cm31_add(b_lo, res_lo)),
        cm31_sub(cm31_add(a_hi, c1_sh),
                 cm31_add(cm31_add(b_hi, c0), res_hi)))
    # ADDI: b = sext17(imm) with limbs (imm + s*(2^20 - 2^17), s*(2^20-1)).
    i_lo = cm31_add(col(COL_IMM_LO),
                    cm31_mul(s_imm, _scalar_vec((two17, 0), big)))
    i_hi = cm31_mul(s_imm, _scalar_vec(((1 << 20) - 1, 0), big))
    pin(sel_by[0x08],
        cm31_sub(cm31_add(a_lo, i_lo), cm31_add(res_lo, c0_sh)),
        cm31_sub(cm31_add(cm31_add(a_hi, i_hi), c0),
                 cm31_add(res_hi, c1_sh)))
    # JAL/JALR: rd = pc + 4 mod 2^40.
    sel_jump = cm31_add(sel_by[0x48], sel_by[0x49])
    pin(sel_jump,
        cm31_sub(cm31_add(col(COL_PC_LO), four), cm31_add(res_lo, c0_sh)),
        cm31_sub(cm31_add(col(COL_PC_HI), c0), cm31_add(res_hi, c1_sh)))

    # Control-flow witness booleans; the target lo carry c2 is in
    # {0, 1, 2} (JAL's 21-bit offset can carry 2 out of the low limb).
    taken = col(COL_TAKEN)
    c2 = col(COL_CARRY2)
    c3 = col(COL_CARRY3)
    b_lsb = col(COL_BLSB)
    for bcol in (taken, c3, b_lsb):
        singles.append(cm31_mul(bcol, cm31_sub(bcol, one)))
    singles.append(cm31_mul(cm31_mul(c2, cm31_sub(c2, one)),
                            cm31_sub(c2, _scalar_vec((2, 0), big))))

    # --- Memory-op binding ---
    # flags = is_mem + 2*is_store + 4*width, all selector-derived.
    def selsum(ops):
        acc = None
        for v in ops:
            acc = sel_by[v] if acc is None else cm31_add(acc, sel_by[v])
        return acc

    sel_loads = selsum(LOAD_OPS)
    sel_stores = selsum(STORE_OPS)
    flags_expr = cm31_add(sel_loads, cm31_mul(sel_stores,
                                              _scalar_vec((3, 0), big)))
    for v, width in MEM_WIDTHS.items():
        flags_expr = cm31_add(flags_expr, cm31_mul(
            sel_by[v], _scalar_vec((4 * width, 0), big)))
    singles.append(cm31_sub(col(COL_MEM_FLAGS), flags_expr))

    # Address-limb decomposition (unique encoding below 2^20).
    maddr_lo = col(COL_MEM_ADDR_LO)
    maddr_hi = col(COL_MEM_ADDR_HI)
    for limb, c_base in ((maddr_lo, COL_MADDR_CH0),
                         (maddr_hi, COL_MADDR_CH0 + 2)):
        singles.append(cm31_sub(
            limb, cm31_add(col(c_base), cm31_mul(
                col(c_base + 1), _scalar_vec((1 << 10, 0), big)))))

    # Address pin: maddr = base + sext17(imm) mod 2^40.  Loads (I-type)
    # read the base through rs1; stores (S-type) through the rd bitfield.
    g_lo, g_hi = operand(e, COL_REG_LO), operand(e, COL_REG_HI)
    c2_sh = cm31_mul(c2, two20)
    c3_sh = cm31_mul(c3, two20)
    for sel_m, base_lo, base_hi in ((sel_loads, a_lo, a_hi),
                                    (sel_stores, g_lo, g_hi)):
        singles.append(cm31_mul(sel_m, cm31_add(
            cm31_sub(cm31_sub(maddr_lo, base_lo), i_lo), c2_sh)))
        singles.append(cm31_mul(sel_m, cm31_add(
            cm31_sub(cm31_sub(cm31_sub(maddr_hi, base_hi), i_hi), c2),
            c3_sh)))

    # Value pins.  Zero-extending loads: res == mval (the loaded value is
    # what lands in rd).  SD stores the full 40-bit a operand; SW stores
    # a mod 2^32 (truncation witness tw).  LB/LH (sign-extend) and SB/SH
    # value links remain documented gaps.
    mval_lo = col(COL_MEM_VAL_LO)
    mval_hi = col(COL_MEM_VAL_HI)
    sel_zl = selsum(ZEXT_LOAD_OPS)
    singles.append(cm31_mul(sel_zl, cm31_sub(res_lo, mval_lo)))
    singles.append(cm31_mul(sel_zl, cm31_sub(res_hi, mval_hi)))
    singles.append(cm31_mul(sel_by[0x3B], cm31_sub(a_lo, mval_lo)))
    singles.append(cm31_mul(sel_by[0x3B], cm31_sub(a_hi, mval_hi)))
    singles.append(cm31_mul(sel_by[0x3A], cm31_sub(a_lo, mval_lo)))
    singles.append(cm31_mul(sel_by[0x3A], cm31_sub(
        a_hi, cm31_add(mval_hi, cm31_mul(col(COL_SW_TW),
                                         _scalar_vec((1 << 12, 0), big))))))

    # --- Compare / branch-condition / cmov block ---
    # Committed operand views (degree-1 handles on the inner products).
    va_lo, va_hi = col(COL_VA_LO), col(COL_VA_HI)
    vb_lo, vb_hi = col(COL_VB_LO), col(COL_VB_HI)
    vg_lo, vg_hi = col(COL_VG_LO), col(COL_VG_HI)
    for vcol, expr in ((va_lo, a_lo), (va_hi, a_hi), (vb_lo, b_lo),
                       (vb_hi, b_hi), (vg_lo, g_lo), (vg_hi, g_hi)):
        singles.append(cm31_sub(vcol, expr))
    cu_lo, cu_hi = col(COL_CU_LO), col(COL_CU_HI)
    cb0, cb1 = col(COL_CB0), col(COL_CB1)
    cinv, ceq = col(COL_CINV), col(COL_CEQ)
    sa, sb = col(COL_SA), col(COL_SB)
    x1 = col(COL_X1)
    for bcol in (cb0, cb1, sa, sb):
        singles.append(cm31_mul(bcol, cm31_sub(bcol, one)))
    # cu chunk decomposition (unique below 2^20).
    for limb, c_base in ((cu_lo, COL_CCH0), (cu_hi, COL_CCH0 + 2)):
        singles.append(cm31_sub(
            limb, cm31_add(col(c_base), cm31_mul(
                col(c_base + 1), _scalar_vec((1 << 10, 0), big)))))
    # Equality gadget on s = cu_lo + cu_hi (< 2^21 < p, so s = 0 iff both
    # limbs are 0 iff the 40-bit difference is 0): ceq = 1 - s*cinv and
    # ceq*s = 0 force ceq = [cu == 0].
    s_eq = cm31_add(cu_lo, cu_hi)
    singles.append(cm31_sub(cm31_add(ceq, cm31_mul(s_eq, cinv)), one))
    singles.append(cm31_mul(ceq, s_eq))
    # x1 = cb1 XOR sa; lt_signed = x1 XOR sb (sign-XOR trick,
    # value.rs:710-716: flip the unsigned borrow when the signs differ).
    two = _scalar_vec((2, 0), big)
    singles.append(cm31_sub(
        x1, cm31_sub(cm31_add(cb1, sa),
                     cm31_mul(two, cm31_mul(cb1, sa)))))
    lts = cm31_sub(cm31_add(x1, sb),
                   cm31_mul(two, cm31_mul(x1, sb)))
    # cu pins: cu = x - y mod 2^40 in borrow form, where the compare
    # operands (x, y) are (a, b) for the compare family and
    # (rd-field, rs1-field) for branches (B-type bitfield quirk,
    # encoding.rs:142-159); cmov rows pin cu = b (so ceq = [b == 0], the
    # cmov condition).  Sign decompositions x_hi/y_hi = r0 + 2^10 r1 +
    # 2^19 s (chunk ranges by the lookup channels) extract bit 39.
    sel_cmp = selsum(COMPARE_OPS)
    sel_brf = selsum(BRANCH_OPS)
    sel_cmovf = selsum(CMOV_OPS)
    cb0_sh = cm31_mul(cb0, two20)
    cb1_sh = cm31_mul(cb1, two20)
    sign_dec_a = cm31_add(cm31_add(
        col(COL_AR0), cm31_mul(col(COL_AR1),
                               _scalar_vec((1 << 10, 0), big))),
        cm31_mul(sa, _scalar_vec((1 << 19, 0), big)))
    sign_dec_b = cm31_add(cm31_add(
        col(COL_BR0), cm31_mul(col(COL_BR1),
                               _scalar_vec((1 << 10, 0), big))),
        cm31_mul(sb, _scalar_vec((1 << 19, 0), big)))
    for sel_f, x_lo, x_hi, y_lo, y_hi in (
            (sel_cmp, va_lo, va_hi, vb_lo, vb_hi),
            (sel_brf, vg_lo, vg_hi, va_lo, va_hi)):
        singles.append(cm31_mul(sel_f, cm31_add(
            cm31_sub(cm31_sub(x_lo, y_lo), cu_lo), cb0_sh)))
        singles.append(cm31_mul(sel_f, cm31_add(
            cm31_sub(cm31_sub(cm31_sub(x_hi, y_hi), cb0), cu_hi),
            cb1_sh)))
        singles.append(cm31_mul(sel_f, cm31_sub(x_hi, sign_dec_a)))
        singles.append(cm31_mul(sel_f, cm31_sub(y_hi, sign_dec_b)))
    singles.append(cm31_mul(sel_cmovf, cm31_sub(cu_lo, vb_lo)))
    singles.append(cm31_mul(sel_cmovf, cm31_sub(cu_hi, vb_hi)))
    # Compare-family result pins: res in {0,1} per the op's predicate
    # (cb1 = unsigned lt, lts = signed lt, ceq = equal).
    singles.append(cm31_mul(sel_cmp, res_hi))
    for v, pred, neg in ((0x20, cb1, False), (0x21, cb1, True),
                         (0x22, lts, False), (0x23, lts, True),
                         (0x24, ceq, False), (0x25, ceq, True)):
        want = cm31_sub(one, pred) if neg else pred
        singles.append(cm31_mul(sel_by[v], cm31_sub(res_lo, want)))
    # Branch taken bit DERIVED from the operands (closes control flow:
    # the pc-target transitions consume this bit).
    for v, pred, neg in ((0x40, ceq, False), (0x41, ceq, True),
                         (0x42, lts, False), (0x43, lts, True),
                         (0x44, cb1, False), (0x45, cb1, True)):
        want = cm31_sub(one, pred) if neg else pred
        singles.append(cm31_mul(sel_by[v], cm31_sub(taken, want)))
    # CMOV result pins: res = cond ? a : rd_old with cond = [b != 0]
    # (CMOV/CMOVNZ) or [b == 0] (CMOVZ).  A false condition writes
    # rd_old, matching the no-write semantics (execute.rs:434-474).
    sel_nz = cm31_add(sel_by[0x26], sel_by[0x28])
    nceq = cm31_sub(one, ceq)
    for selc, cond in ((sel_nz, nceq), (sel_by[0x27], ceq)):
        ncond = cm31_sub(one, cond)
        singles.append(cm31_mul(selc, cm31_sub(
            res_lo, cm31_add(cm31_mul(cond, va_lo),
                             cm31_mul(ncond, vg_lo)))))
        singles.append(cm31_mul(selc, cm31_sub(
            res_hi, cm31_add(cm31_mul(cond, va_hi),
                             cm31_mul(ncond, vg_hi)))))

    # --- Halt-chain block: exit-ECALL detection gadget ---
    # s10 = r10_lo + r10_hi (< 2^21 < p, zero iff r10 == 0); on ECALL rows
    # eex = [s10 == 0] via eex + s10*einv = 1 and eex*s10 = 0.
    eex = col(COL_EEX)
    einv = col(COL_EINV)
    s10 = cm31_add(col(COL_REG_LO + 10), col(COL_REG_HI + 10))
    sel_ec = sel_by[0x50]
    sel_eb = sel_by[0x51]
    singles.append(cm31_mul(eex, cm31_sub(eex, one)))
    singles.append(cm31_mul(sel_ec, cm31_sub(
        cm31_add(eex, cm31_mul(s10, einv)), one)))
    singles.append(cm31_mul(sel_ec, cm31_mul(eex, s10)))

    # --- Multiply/divide block (layout comment in trace.py at MD_BASE) ---
    two10 = _scalar_vec((1 << 10, 0), big)
    sel_mul, sel_mulh = sel_by[0x02], sel_by[0x03]
    sel_divf = selsum((0x04, 0x05, 0x06, 0x07))
    sel_mulf = cm31_add(sel_mul, sel_mulh)
    sel_md = cm31_add(sel_mulf, sel_divf)
    xq = [col(COL_XQ0 + i) for i in range(4)]
    yq = [col(COL_YQ0 + i) for i in range(4)]
    pl = [col(COL_PL0 + i) for i in range(4)]
    dr = [col(COL_DR0 + i) for i in range(4)]
    uc = [col(COL_U0 + i) for i in range(4)]

    def comb2(c0v, c1v):
        return cm31_add(c0v, cm31_mul(c1v, two10))

    xq_lo, xq_hi = comb2(xq[0], xq[1]), comb2(xq[2], xq[3])
    yq_lo, yq_hi = comb2(yq[0], yq[1]), comb2(yq[2], yq[3])
    dr_lo, dr_hi = comb2(dr[0], dr[1]), comb2(dr[2], dr[3])
    pl_lo, pl_hi = comb2(pl[0], pl[1]), comb2(pl[2], pl[3])
    u_lo, u_hi = comb2(uc[0], uc[1]), comb2(uc[2], uc[3])
    # Operand bindings: x = a on MUL/MULH rows, x = res (the quotient) on
    # DIV/DIVU rows (REM/REMU leave x a free 40-bit witness); y = b on
    # every mul/div row; res = r on REM/REMU rows.
    singles.append(cm31_mul(sel_mulf, cm31_sub(va_lo, xq_lo)))
    singles.append(cm31_mul(sel_mulf, cm31_sub(va_hi, xq_hi)))
    singles.append(cm31_mul(sel_md, cm31_sub(vb_lo, yq_lo)))
    singles.append(cm31_mul(sel_md, cm31_sub(vb_hi, yq_hi)))
    sel_qres = cm31_add(sel_by[0x04], sel_by[0x06])
    singles.append(cm31_mul(sel_qres, cm31_sub(res_lo, xq_lo)))
    singles.append(cm31_mul(sel_qres, cm31_sub(res_hi, xq_hi)))
    sel_rres = cm31_add(sel_by[0x05], sel_by[0x07])
    singles.append(cm31_mul(sel_rres, cm31_sub(res_lo, dr_lo)))
    singles.append(cm31_mul(sel_rres, cm31_sub(res_hi, dr_hi)))
    # Carry reconstructions (k0 a bare chunk; k1/k6 chunk + 1 bit;
    # k2..k5 chunk + 2 bits) with bit boolean constraints.
    kvals = [col(COL_K0)]
    for cc, bits in ((COL_K1C, 1), (COL_K2C, 2), (COL_K3C, 2),
                     (COL_K4C, 2), (COL_K5C, 2), (COL_K6C, 1)):
        b0v = col(cc + 1)
        singles.append(cm31_mul(b0v, cm31_sub(b0v, one)))
        hi_part = b0v
        if bits == 2:
            b1v = col(cc + 2)
            singles.append(cm31_mul(b1v, cm31_sub(b1v, one)))
            hi_part = cm31_add(b0v, cm31_mul(b1v, _scalar_vec((2, 0), big)))
        kvals.append(cm31_add(col(cc), cm31_mul(hi_part, two10)))
    # Column sums s_t = sum_{i+j=t} xq_i * yq_j (degree 2).
    s_sums = []
    for t in range(7):
        acc = None
        for i in range(4):
            j = t - i
            if 0 <= j < 4:
                term = cm31_mul(xq[i], yq[j])
                acc = term if acc is None else cm31_add(acc, term)
        s_sums.append(acc)
    res_ch = [col(COL_RES_CH0 + i) for i in range(4)]
    # Low chain (stages 0..3): result chunks on MUL rows; pl chunks on
    # MULH/DIV rows.  Every term < 2^23 << p: field identity == integers.
    sel_plchain = cm31_add(sel_mulh, sel_divf)
    for t in range(4):
        base_e = s_sums[t] if t == 0 else cm31_add(s_sums[t], kvals[t - 1])
        k_sh = cm31_mul(kvals[t], two10)
        singles.append(cm31_mul(sel_mul, cm31_sub(
            base_e, cm31_add(res_ch[t], k_sh))))
        singles.append(cm31_mul(sel_plchain, cm31_sub(
            base_e, cm31_add(pl[t], k_sh))))
    # MULH high chain (stages 4..6 -> res chunks 0..2; chunk 7 = k6).
    for t in range(4, 7):
        base_e = cm31_add(s_sums[t], kvals[t - 1])
        singles.append(cm31_mul(sel_mulh, cm31_sub(
            base_e, cm31_add(res_ch[t - 4], cm31_mul(kvals[t], two10)))))
    singles.append(cm31_mul(sel_mulh, cm31_sub(res_ch[3], kvals[6])))
    # Division: q*b < 2^40 (high stages vanish), a = q*b + r exactly,
    # and r < b via u = b - 1 - r >= 0.
    singles.append(cm31_mul(sel_divf, cm31_add(s_sums[4], kvals[3])))
    singles.append(cm31_mul(sel_divf, s_sums[5]))
    singles.append(cm31_mul(sel_divf, s_sums[6]))
    cd0, e0 = col(COL_CD0), col(COL_E0)
    singles.append(cm31_mul(cd0, cm31_sub(cd0, one)))
    singles.append(cm31_mul(e0, cm31_sub(e0, one)))
    singles.append(cm31_mul(sel_divf, cm31_sub(
        cm31_add(pl_lo, dr_lo), cm31_add(va_lo, cm31_mul(cd0, two20)))))
    singles.append(cm31_mul(sel_divf, cm31_sub(
        cm31_add(cm31_add(pl_hi, dr_hi), cd0), va_hi)))
    singles.append(cm31_mul(sel_divf, cm31_sub(
        cm31_add(cm31_add(u_lo, one), dr_lo),
        cm31_add(vb_lo, cm31_mul(e0, two20)))))
    singles.append(cm31_mul(sel_divf, cm31_sub(
        cm31_add(cm31_add(u_hi, dr_hi), e0), vb_hi)))

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

    # Result binding: on a writing row the destination register's next-row
    # value must equal the committed result limbs (degree 3).  Together
    # with the op-specific pins above this links e.g. ADD's written value
    # to rs1 + rs2.
    for r in range(1, 16):
        we = cm31_mul(w, e[r])
        transitions.append(cm31_mul(we, cm31_sub(nxt(COL_REG_LO + r),
                                                 res_lo)))
        transitions.append(cm31_mul(we, cm31_sub(nxt(COL_REG_HI + r),
                                                 res_hi)))

    # Branch/jump pc-target semantics (trace.py control-flow block).
    # The next row's pc limbs are table-range-bound via program binding.
    sel_br = None
    for v in BRANCH_OPS:
        sel_br = sel_by[v] if sel_br is None else cm31_add(sel_br, sel_by[v])
    c2_sh = cm31_mul(c2, two20)
    c3_sh = cm31_mul(c3, two20)
    d_lo = cm31_add(cm31_mul(taken, i_lo),
                    cm31_mul(cm31_sub(one, taken), four))
    transitions.append(cm31_mul(sel_br, cm31_add(
        cm31_sub(cm31_sub(nxt(COL_PC_LO), pc_lo), d_lo), c2_sh)))
    transitions.append(cm31_mul(sel_br, cm31_add(
        cm31_sub(cm31_sub(cm31_sub(nxt(COL_PC_HI), pc_hi),
                          cm31_mul(taken, i_hi)), c2), c3_sh)))
    # JAL: pc' = pc + sext21(16*imm + rs1); sign bit of the 21-bit offset
    # is word bit 31 = imm_s; (2^40 - 2^21) has limbs (0, 0xFFFFE).
    jal_off = cm31_add(cm31_mul(col(COL_IMM_LO), _scalar_vec((16, 0), big)),
                       col(COL_RS1))
    transitions.append(cm31_mul(sel_by[0x48], cm31_add(
        cm31_sub(cm31_sub(nxt(COL_PC_LO), pc_lo), jal_off), c2_sh)))
    transitions.append(cm31_mul(sel_by[0x48], cm31_add(
        cm31_sub(cm31_sub(cm31_sub(nxt(COL_PC_HI), pc_hi),
                          cm31_mul(s_imm, _scalar_vec((0xFFFFE, 0), big))),
                 c2), c3_sh)))
    # JALR: pc' = (rs1_val + sext17(imm)) & ~1.
    transitions.append(cm31_mul(sel_by[0x49], cm31_add(cm31_add(
        cm31_sub(cm31_sub(nxt(COL_PC_LO), a_lo), i_lo), b_lsb), c2_sh)))
    transitions.append(cm31_mul(sel_by[0x49], cm31_add(
        cm31_sub(cm31_sub(cm31_sub(nxt(COL_PC_HI), a_hi), i_hi), c2),
        c3_sh)))

    # Halt chain: a halted machine keeps halting.  An EBREAK row's
    # successor must be an EBREAK row (prevents "resuming" after a halt
    # at an arbitrary pc with registers preserved); an exit-ECALL row's
    # successor likewise; a non-exit ECALL advances pc by exactly 4
    # (vm.rs:277-279), reusing the carry column (free on non-seq rows).
    sel_eb_next = nxt(COL_SEL0 + OP_VALUES.index(0x51))
    transitions.append(cm31_mul(sel_eb, cm31_sub(one, sel_eb_next)))
    transitions.append(cm31_mul(cm31_mul(sel_ec, eex),
                                cm31_sub(one, sel_eb_next)))
    ec_adv = cm31_mul(sel_ec, cm31_sub(one, eex))
    transitions.append(cm31_mul(ec_adv, t1_inner))
    transitions.append(cm31_mul(ec_adv, t2_inner))

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
    """The cyclic LogUp constraints on the LDE domain, one per CHANNELS
    entry.

    Per channel k (w = the channel's affine witness, m = multiplicities,
    t = table, S the phase-2 partial-sum column):

        (S' - S) (beta - w) (beta - t)  -  (beta - t)  +  m (beta - w) = 0

    Degree 3; divides by Z_H (holds cyclically on every row — the
    telescoping around the cycle IS the multiset identity).
    """
    blowup = 1 << log_blowup
    big = ext_r.shape[1]
    beta_vec = _scalar_vec(beta, big)
    t = (ext_r[COL_TABLE], ext_i[COL_TABLE])
    bt = cm31_sub(beta_vec, t)
    sr, si = s_ext

    def affine_vec(const, terms):
        acc = _scalar_vec((const % P, 0), big)
        for c, coef in terms:
            acc = cm31_add(acc, cm31_mul(
                (ext_r[c], ext_i[c]), _scalar_vec((coef % P, 0), big)))
        return acc

    out = []
    for k, (_, const, terms) in enumerate(CHANNELS):
        w = affine_vec(const, terms)
        m = (ext_r[COL_MULT0 + k], ext_i[COL_MULT0 + k])
        s = (sr[k], si[k])
        s_next = (jnp.roll(sr[k], -blowup), jnp.roll(si[k], -blowup))
        bw = cm31_sub(beta_vec, w)
        lhs = cm31_mul(cm31_mul(cm31_sub(s_next, s), bw), bt)
        rhs = cm31_sub(bt, cm31_mul(m, bw))
        out.append(cm31_sub(lhs, rhs))
    return out


def memory_constraint_evals(ext_r, ext_i, log_blowup: int):
    """Sorted-memory-table constraints (active in range_lookup mode; the
    prover fills the block in _build_memory_table).

    Returns (singles, transitions, firsts):
      singles: m_w/m_real/m_same/m_hieq booleans
      firsts:  m_same = 0; exec clk = 0; a first-row read returns 0
      transitions (next-row chunks D' = cha' + 2^10 chb' gap-check both
      the clk-strict-increase within an address run and the
      address-strict-increase between runs):
        clk' = clk + 1                      (exec clk chain)
        real' => real                       (real rows first)
        same' => addr' = addr  (per limb)
        hieq' => addr_hi' = addr_hi
        !same' => addr' = addr + 1 + D' on the lexicographic limb
        same' => clk_m' = clk_m + 1 + D'
        same' & read' => val' = val         (reads see the last value)
        !same' & read' => val' = 0          (fresh addresses read zero)
    """
    blowup = 1 << log_blowup
    big = ext_r.shape[1]
    one = _scalar_vec((1, 0), big)

    def col(c):
        return (ext_r[c], ext_i[c])

    def nxt(c):
        return (jnp.roll(ext_r[c], -blowup), jnp.roll(ext_i[c], -blowup))

    m_w, m_real = col(M_W), col(M_REAL)
    m_same, m_hieq = col(M_SAME), col(M_HIEQ)
    singles = [cm31_mul(b, cm31_sub(b, one))
               for b in (m_w, m_real, m_same, m_hieq)]

    not_w = cm31_sub(one, m_w)
    firsts = [m_same, col(COL_CLK),
              cm31_mul(not_w, col(M_VAL_LO)),
              cm31_mul(not_w, col(M_VAL_HI))]

    same_n, hieq_n = nxt(M_SAME), nxt(M_HIEQ)
    real_n, w_n = nxt(M_REAL), nxt(M_W)
    not_same_n = cm31_sub(one, same_n)
    not_w_n = cm31_sub(one, w_n)
    d_gap = cm31_add(nxt(M_CHA), cm31_mul(nxt(M_CHB),
                                          _scalar_vec((1 << 10, 0), big)))

    def inc_gap(c):
        return cm31_sub(cm31_sub(cm31_sub(nxt(c), col(c)), one), d_gap)

    transitions = [
        cm31_sub(cm31_sub(nxt(COL_CLK), col(COL_CLK)), one),
        cm31_mul(cm31_sub(one, m_real), real_n),
        cm31_mul(same_n, cm31_sub(nxt(M_ADDR_LO), col(M_ADDR_LO))),
        cm31_mul(same_n, cm31_sub(nxt(M_ADDR_HI), col(M_ADDR_HI))),
        cm31_mul(hieq_n, cm31_sub(nxt(M_ADDR_HI), col(M_ADDR_HI))),
        cm31_mul(not_same_n, cm31_add(
            cm31_mul(hieq_n, inc_gap(M_ADDR_LO)),
            cm31_mul(cm31_sub(one, hieq_n), inc_gap(M_ADDR_HI)))),
        cm31_mul(same_n, inc_gap(M_CLK)),
        cm31_mul(cm31_mul(same_n, not_w_n),
                 cm31_sub(nxt(M_VAL_LO), col(M_VAL_LO))),
        cm31_mul(cm31_mul(same_n, not_w_n),
                 cm31_sub(nxt(M_VAL_HI), col(M_VAL_HI))),
        cm31_mul(cm31_mul(not_same_n, not_w_n), nxt(M_VAL_LO)),
        cm31_mul(cm31_mul(not_same_n, not_w_n), nxt(M_VAL_HI)),
    ]
    return singles, transitions, firsts


def memory_constraint_values_at(row, next_row, n_cols: int):
    """Scalar mirror of memory_constraint_evals for opened rows."""

    def cval(cols, c):
        return (cols[c], cols[n_cols + c])

    one = (1, 0)
    m_w, m_real = cval(row, M_W), cval(row, M_REAL)
    m_same, m_hieq = cval(row, M_SAME), cval(row, M_HIEQ)
    singles = [cm31_mul_scalar(b, _sub2(b, one))
               for b in (m_w, m_real, m_same, m_hieq)]

    not_w = _sub2(one, m_w)
    firsts = [m_same, cval(row, COL_CLK),
              cm31_mul_scalar(not_w, cval(row, M_VAL_LO)),
              cm31_mul_scalar(not_w, cval(row, M_VAL_HI))]

    same_n, hieq_n = cval(next_row, M_SAME), cval(next_row, M_HIEQ)
    real_n, w_n = cval(next_row, M_REAL), cval(next_row, M_W)
    not_same_n = _sub2(one, same_n)
    not_w_n = _sub2(one, w_n)
    d_gap = _add2(cval(next_row, M_CHA),
                  cm31_mul_scalar(cval(next_row, M_CHB), (1 << 10, 0)))

    def inc_gap(c):
        return _sub2(_sub2(_sub2(cval(next_row, c), cval(row, c)), one),
                     d_gap)

    transitions = [
        _sub2(_sub2(cval(next_row, COL_CLK), cval(row, COL_CLK)), one),
        cm31_mul_scalar(_sub2(one, m_real), real_n),
        cm31_mul_scalar(same_n, _sub2(cval(next_row, M_ADDR_LO),
                                      cval(row, M_ADDR_LO))),
        cm31_mul_scalar(same_n, _sub2(cval(next_row, M_ADDR_HI),
                                      cval(row, M_ADDR_HI))),
        cm31_mul_scalar(hieq_n, _sub2(cval(next_row, M_ADDR_HI),
                                      cval(row, M_ADDR_HI))),
        cm31_mul_scalar(not_same_n, _add2(
            cm31_mul_scalar(hieq_n, inc_gap(M_ADDR_LO)),
            cm31_mul_scalar(_sub2(one, hieq_n), inc_gap(M_ADDR_HI)))),
        cm31_mul_scalar(same_n, inc_gap(M_CLK)),
        cm31_mul_scalar(cm31_mul_scalar(same_n, not_w_n),
                        _sub2(cval(next_row, M_VAL_LO),
                              cval(row, M_VAL_LO))),
        cm31_mul_scalar(cm31_mul_scalar(same_n, not_w_n),
                        _sub2(cval(next_row, M_VAL_HI),
                              cval(row, M_VAL_HI))),
        cm31_mul_scalar(cm31_mul_scalar(not_same_n, not_w_n),
                        cval(next_row, M_VAL_LO)),
        cm31_mul_scalar(cm31_mul_scalar(not_same_n, not_w_n),
                        cval(next_row, M_VAL_HI)),
    ]
    return singles, transitions, firsts


def quotient_evals(ext_r, ext_i, log_n: int, log_blowup: int,
                   shift: Tuple[int, int], alpha: Tuple[int, int],
                   lookup=None, program=None, memory=None):
    """Q(x) = sum_j alpha^j C_j(x) / D_j(x) on the coset LDE domain.

    ``lookup``: optional (s_ext, beta) enabling the LogUp constraints.
    ``program``: optional (prog_ext, s_prog_ext, gamma, entry) enabling
    the program-binding channel (requires ``lookup`` for beta) plus the
    entry-point boundary constraints.
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
    if memory is not None:
        (smr, smi), delta = memory
        _, beta = lookup
        blowup = 1 << log_blowup
        m_singles, m_trans, m_firsts = memory_constraint_evals(
            ext_r, ext_i, log_blowup)
        for cs, dinv in ((m_singles, zh_inv), (m_trans, zt_inv),
                         (m_firsts, zf_inv)):
            for c in cs:
                term = cm31_mul(cm31_mul(c, dinv), _scalar_vec(power, big))
                acc = cm31_add(acc, term)
                power = cm31_mul_scalar(power, alpha)
        # Multiset channel: exec (maddr, clk, mval, is_write) tuples of
        # the LD/SD rows == the real sorted-table rows (LogUp with the
        # shared beta; delta compresses the 6-tuple).
        beta_vec = _scalar_vec(beta, big)

        def tuple6(cols, flag):
            acc6 = (ext_r[cols[0]], ext_i[cols[0]])
            p6 = delta
            for c in cols[1:]:
                acc6 = cm31_add(acc6, cm31_mul(
                    (ext_r[c], ext_i[c]), _scalar_vec(p6, big)))
                p6 = cm31_mul_scalar(p6, delta)
            return cm31_add(acc6, cm31_mul(flag, _scalar_vec(p6, big)))

        sel_ld = (ext_r[COL_SEL0 + OP_VALUES.index(0x35)],
                  ext_i[COL_SEL0 + OP_VALUES.index(0x35)])
        sel_sd = (ext_r[COL_SEL0 + OP_VALUES.index(0x3B)],
                  ext_i[COL_SEL0 + OP_VALUES.index(0x3B)])
        v = cm31_add(sel_ld, sel_sd)
        w = tuple6((COL_MEM_ADDR_LO, COL_MEM_ADDR_HI, COL_CLK,
                    COL_MEM_VAL_LO, COL_MEM_VAL_HI), sel_sd)
        t_mem = tuple6((M_ADDR_LO, M_ADDR_HI, M_CLK, M_VAL_LO, M_VAL_HI),
                       (ext_r[M_W], ext_i[M_W]))
        m_real = (ext_r[M_REAL], ext_i[M_REAL])
        s = (smr, smi)
        s_next = (jnp.roll(smr, -blowup), jnp.roll(smi, -blowup))
        bw = cm31_sub(beta_vec, w)
        bt = cm31_sub(beta_vec, t_mem)
        lhs = cm31_mul(cm31_mul(cm31_sub(s_next, s), bw), bt)
        rhs = cm31_sub(cm31_mul(v, bt), cm31_mul(m_real, bw))
        term = cm31_mul(cm31_mul(cm31_sub(lhs, rhs), zh_inv),
                        _scalar_vec(power, big))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)
    if program is not None:
        (pr, pi), (spr, spi), gamma, entry = program
        _, beta = lookup
        blowup = 1 << log_blowup
        one = _scalar_vec((1, 0), big)
        beta_vec = _scalar_vec(beta, big)

        def gmul(vec, g):
            return cm31_mul(vec, _scalar_vec(g, big))

        g2 = cm31_mul_scalar(gamma, gamma)
        g3 = cm31_mul_scalar(g2, gamma)
        f = (ext_r[COL_OPCODE], ext_i[COL_OPCODE])
        for c, coef in PROG_F_TERMS[1:]:
            f = cm31_add(f, cm31_mul((ext_r[c], ext_i[c]),
                                     _scalar_vec((coef, 0), big)))
        w = cm31_add(
            cm31_add((ext_r[COL_PC_LO], ext_i[COL_PC_LO]),
                     gmul((ext_r[COL_PC_HI], ext_i[COL_PC_HI]), gamma)),
            cm31_add(gmul(f, g2),
                     gmul((ext_r[COL_IMM_LO], ext_i[COL_IMM_LO]), g3)))
        t_prog = cm31_add(
            cm31_add((pr[0], pi[0]), gmul((pr[1], pi[1]), gamma)),
            cm31_add(gmul((pr[2], pi[2]), g2), gmul((pr[3], pi[3]), g3)))
        m = (ext_r[COL_PROG_M], ext_i[COL_PROG_M])
        s = (spr, spi)
        s_next = (jnp.roll(spr, -blowup), jnp.roll(spi, -blowup))
        bw = cm31_sub(beta_vec, w)
        bt = cm31_sub(beta_vec, t_prog)
        lhs = cm31_mul(cm31_mul(cm31_sub(s_next, s), bw), bt)
        rhs = cm31_sub(bt, cm31_mul(m, bw))
        term = cm31_mul(cm31_mul(cm31_sub(lhs, rhs), zh_inv),
                        _scalar_vec(power, big))
        acc = cm31_add(acc, term)
        power = cm31_mul_scalar(power, alpha)

        # Entry-point boundary: the first row executes at the program's
        # public entry point.
        e_lo = entry & ((1 << 20) - 1)
        e_hi = (entry >> 20) & ((1 << 20) - 1)
        for c_idx, e_val in ((COL_PC_LO, e_lo), (COL_PC_HI, e_hi)):
            c = cm31_sub((ext_r[c_idx], ext_i[c_idx]),
                         _scalar_vec((e_val, 0), big))
            term = cm31_mul(cm31_mul(c, zf_inv), _scalar_vec(power, big))
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

    def onehot_block(base, field_col):
        blk = [cval(row, base + i) for i in range(16)]
        for bi in blk:
            singles.append(cm31_mul_scalar(bi, _sub2(bi, one)))
        b_sum, f_sum = (0, 0), (0, 0)
        for i in range(16):
            b_sum = _add2(b_sum, blk[i])
            f_sum = _add2(f_sum, cm31_mul_scalar(blk[i], (i, 0)))
        singles.append(_sub2(b_sum, one))
        singles.append(_sub2(f_sum, cval(row, field_col)))
        return blk

    e = onehot_block(COL_RD1H0, COL_RD)
    e1 = onehot_block(COL_RS1H0, COL_RS1)
    e2 = onehot_block(COL_RS2H0, COL_RS2)

    c0 = cval(row, COL_CARRY0)
    c1 = cval(row, COL_CARRY1)
    s_imm = cval(row, COL_IMM_S)
    for bcol in (c0, c1, s_imm):
        singles.append(cm31_mul_scalar(bcol, _sub2(bcol, one)))

    q0 = cval(row, COL_IMM_Q0)
    singles.append(_sub2(
        cval(row, COL_IMM_LO),
        _add2(_add2(q0, cm31_mul_scalar(cval(row, COL_IMM_Q1),
                                        (1 << 10, 0))),
              cm31_mul_scalar(s_imm, (1 << 16, 0)))))
    singles.append(_sub2(
        q0, _add2(cval(row, COL_RS2),
                  cm31_mul_scalar(cval(row, COL_IMM_Q0HI), (16, 0)))))

    res_lo = cval(row, COL_RES_LO)
    res_hi = cval(row, COL_RES_HI)
    for res, c_base in ((res_lo, COL_RES_CH0), (res_hi, COL_RES_CH0 + 2)):
        singles.append(_sub2(
            res, _add2(cval(row, c_base),
                       cm31_mul_scalar(cval(row, c_base + 1),
                                       (1 << 10, 0)))))

    def operand(blk, base):
        acc = (0, 0)
        for i in range(16):
            acc = _add2(acc, cm31_mul_scalar(blk[i], cval(row, base + i)))
        return acc

    a_lo, a_hi = operand(e1, COL_REG_LO), operand(e1, COL_REG_HI)
    b_lo, b_hi = operand(e2, COL_REG_LO), operand(e2, COL_REG_HI)

    sel_by = {v: sel[j] for j, v in enumerate(OP_VALUES)}
    two17 = (1 << 20) - (1 << 17)
    c0_sh = cm31_mul_scalar(c0, (1 << 20, 0))
    c1_sh = cm31_mul_scalar(c1, (1 << 20, 0))

    def pin(selector, lo_expr, hi_expr):
        singles.append(cm31_mul_scalar(selector, lo_expr))
        singles.append(cm31_mul_scalar(selector, hi_expr))

    pin(sel_by[0x00],
        _sub2(_add2(a_lo, b_lo), _add2(res_lo, c0_sh)),
        _sub2(_add2(_add2(a_hi, b_hi), c0), _add2(res_hi, c1_sh)))
    pin(sel_by[0x01],
        _sub2(_add2(a_lo, c0_sh), _add2(b_lo, res_lo)),
        _sub2(_add2(a_hi, c1_sh), _add2(_add2(b_hi, c0), res_hi)))
    i_lo = _add2(cval(row, COL_IMM_LO), cm31_mul_scalar(s_imm, (two17, 0)))
    i_hi = cm31_mul_scalar(s_imm, ((1 << 20) - 1, 0))
    pin(sel_by[0x08],
        _sub2(_add2(a_lo, i_lo), _add2(res_lo, c0_sh)),
        _sub2(_add2(_add2(a_hi, i_hi), c0), _add2(res_hi, c1_sh)))
    sel_jump = _add2(sel_by[0x48], sel_by[0x49])
    pin(sel_jump,
        _sub2(_add2(cval(row, COL_PC_LO), (4, 0)), _add2(res_lo, c0_sh)),
        _sub2(_add2(cval(row, COL_PC_HI), c0), _add2(res_hi, c1_sh)))

    taken = cval(row, COL_TAKEN)
    c2 = cval(row, COL_CARRY2)
    c3 = cval(row, COL_CARRY3)
    b_lsb = cval(row, COL_BLSB)
    for bcol in (taken, c3, b_lsb):
        singles.append(cm31_mul_scalar(bcol, _sub2(bcol, one)))
    singles.append(cm31_mul_scalar(
        cm31_mul_scalar(c2, _sub2(c2, one)), _sub2(c2, (2, 0))))

    def selsum(ops):
        acc = (0, 0)
        for v in ops:
            acc = _add2(acc, sel_by[v])
        return acc

    sel_loads = selsum(LOAD_OPS)
    sel_stores = selsum(STORE_OPS)
    flags_expr = _add2(sel_loads, cm31_mul_scalar(sel_stores, (3, 0)))
    for v, width in MEM_WIDTHS.items():
        flags_expr = _add2(flags_expr,
                           cm31_mul_scalar(sel_by[v], (4 * width, 0)))
    singles.append(_sub2(cval(row, COL_MEM_FLAGS), flags_expr))

    maddr_lo = cval(row, COL_MEM_ADDR_LO)
    maddr_hi = cval(row, COL_MEM_ADDR_HI)
    for limb, c_base in ((maddr_lo, COL_MADDR_CH0),
                         (maddr_hi, COL_MADDR_CH0 + 2)):
        singles.append(_sub2(
            limb, _add2(cval(row, c_base),
                        cm31_mul_scalar(cval(row, c_base + 1),
                                        (1 << 10, 0)))))

    g_lo, g_hi = operand(e, COL_REG_LO), operand(e, COL_REG_HI)
    c2_sh = cm31_mul_scalar(c2, (1 << 20, 0))
    c3_sh = cm31_mul_scalar(c3, (1 << 20, 0))
    for sel_m, base_lo, base_hi in ((sel_loads, a_lo, a_hi),
                                    (sel_stores, g_lo, g_hi)):
        singles.append(cm31_mul_scalar(sel_m, _add2(
            _sub2(_sub2(maddr_lo, base_lo), i_lo), c2_sh)))
        singles.append(cm31_mul_scalar(sel_m, _add2(
            _sub2(_sub2(_sub2(maddr_hi, base_hi), i_hi), c2), c3_sh)))

    mval_lo = cval(row, COL_MEM_VAL_LO)
    mval_hi = cval(row, COL_MEM_VAL_HI)
    sel_zl = selsum(ZEXT_LOAD_OPS)
    singles.append(cm31_mul_scalar(sel_zl, _sub2(res_lo, mval_lo)))
    singles.append(cm31_mul_scalar(sel_zl, _sub2(res_hi, mval_hi)))
    singles.append(cm31_mul_scalar(sel_by[0x3B], _sub2(a_lo, mval_lo)))
    singles.append(cm31_mul_scalar(sel_by[0x3B], _sub2(a_hi, mval_hi)))
    singles.append(cm31_mul_scalar(sel_by[0x3A], _sub2(a_lo, mval_lo)))
    singles.append(cm31_mul_scalar(sel_by[0x3A], _sub2(
        a_hi, _add2(mval_hi, cm31_mul_scalar(cval(row, COL_SW_TW),
                                             (1 << 12, 0))))))

    # --- Compare / branch-condition / cmov block (scalar mirror) ---
    va_lo, va_hi = cval(row, COL_VA_LO), cval(row, COL_VA_HI)
    vb_lo, vb_hi = cval(row, COL_VB_LO), cval(row, COL_VB_HI)
    vg_lo, vg_hi = cval(row, COL_VG_LO), cval(row, COL_VG_HI)
    for vcol, expr in ((va_lo, a_lo), (va_hi, a_hi), (vb_lo, b_lo),
                       (vb_hi, b_hi), (vg_lo, g_lo), (vg_hi, g_hi)):
        singles.append(_sub2(vcol, expr))
    cu_lo, cu_hi = cval(row, COL_CU_LO), cval(row, COL_CU_HI)
    cb0, cb1 = cval(row, COL_CB0), cval(row, COL_CB1)
    cinv, ceq = cval(row, COL_CINV), cval(row, COL_CEQ)
    sa, sb = cval(row, COL_SA), cval(row, COL_SB)
    x1 = cval(row, COL_X1)
    for bcol in (cb0, cb1, sa, sb):
        singles.append(cm31_mul_scalar(bcol, _sub2(bcol, one)))
    for limb, c_base in ((cu_lo, COL_CCH0), (cu_hi, COL_CCH0 + 2)):
        singles.append(_sub2(
            limb, _add2(cval(row, c_base),
                        cm31_mul_scalar(cval(row, c_base + 1),
                                        (1 << 10, 0)))))
    s_eq = _add2(cu_lo, cu_hi)
    singles.append(_sub2(_add2(ceq, cm31_mul_scalar(s_eq, cinv)), one))
    singles.append(cm31_mul_scalar(ceq, s_eq))
    singles.append(_sub2(
        x1, _sub2(_add2(cb1, sa),
                  cm31_mul_scalar(cm31_mul_scalar(cb1, sa), (2, 0)))))
    lts = _sub2(_add2(x1, sb),
                cm31_mul_scalar(cm31_mul_scalar(x1, sb), (2, 0)))
    sel_cmp = selsum(COMPARE_OPS)
    sel_brf = selsum(BRANCH_OPS)
    sel_cmovf = selsum(CMOV_OPS)
    cb0_sh = cm31_mul_scalar(cb0, (1 << 20, 0))
    cb1_sh = cm31_mul_scalar(cb1, (1 << 20, 0))
    sign_dec_a = _add2(_add2(
        cval(row, COL_AR0),
        cm31_mul_scalar(cval(row, COL_AR1), (1 << 10, 0))),
        cm31_mul_scalar(sa, (1 << 19, 0)))
    sign_dec_b = _add2(_add2(
        cval(row, COL_BR0),
        cm31_mul_scalar(cval(row, COL_BR1), (1 << 10, 0))),
        cm31_mul_scalar(sb, (1 << 19, 0)))
    for sel_f, x_lo, x_hi, y_lo, y_hi in (
            (sel_cmp, va_lo, va_hi, vb_lo, vb_hi),
            (sel_brf, vg_lo, vg_hi, va_lo, va_hi)):
        singles.append(cm31_mul_scalar(sel_f, _add2(
            _sub2(_sub2(x_lo, y_lo), cu_lo), cb0_sh)))
        singles.append(cm31_mul_scalar(sel_f, _add2(
            _sub2(_sub2(_sub2(x_hi, y_hi), cb0), cu_hi), cb1_sh)))
        singles.append(cm31_mul_scalar(sel_f, _sub2(x_hi, sign_dec_a)))
        singles.append(cm31_mul_scalar(sel_f, _sub2(y_hi, sign_dec_b)))
    singles.append(cm31_mul_scalar(sel_cmovf, _sub2(cu_lo, vb_lo)))
    singles.append(cm31_mul_scalar(sel_cmovf, _sub2(cu_hi, vb_hi)))
    singles.append(cm31_mul_scalar(sel_cmp, res_hi))
    for v, pred, neg in ((0x20, cb1, False), (0x21, cb1, True),
                         (0x22, lts, False), (0x23, lts, True),
                         (0x24, ceq, False), (0x25, ceq, True)):
        want = _sub2(one, pred) if neg else pred
        singles.append(cm31_mul_scalar(sel_by[v], _sub2(res_lo, want)))
    for v, pred, neg in ((0x40, ceq, False), (0x41, ceq, True),
                         (0x42, lts, False), (0x43, lts, True),
                         (0x44, cb1, False), (0x45, cb1, True)):
        want = _sub2(one, pred) if neg else pred
        singles.append(cm31_mul_scalar(sel_by[v], _sub2(taken, want)))
    sel_nz = _add2(sel_by[0x26], sel_by[0x28])
    nceq = _sub2(one, ceq)
    for selc, cond in ((sel_nz, nceq), (sel_by[0x27], ceq)):
        ncond = _sub2(one, cond)
        singles.append(cm31_mul_scalar(selc, _sub2(
            res_lo, _add2(cm31_mul_scalar(cond, va_lo),
                          cm31_mul_scalar(ncond, vg_lo)))))
        singles.append(cm31_mul_scalar(selc, _sub2(
            res_hi, _add2(cm31_mul_scalar(cond, va_hi),
                          cm31_mul_scalar(ncond, vg_hi)))))

    # --- Halt-chain block (scalar mirror) ---
    eex = cval(row, COL_EEX)
    einv = cval(row, COL_EINV)
    s10 = _add2(cval(row, COL_REG_LO + 10), cval(row, COL_REG_HI + 10))
    sel_ec = sel_by[0x50]
    sel_eb = sel_by[0x51]
    singles.append(cm31_mul_scalar(eex, _sub2(eex, one)))
    singles.append(cm31_mul_scalar(sel_ec, _sub2(
        _add2(eex, cm31_mul_scalar(s10, einv)), one)))
    singles.append(cm31_mul_scalar(sel_ec, cm31_mul_scalar(eex, s10)))

    # --- Multiply/divide block (scalar mirror) ---
    sel_mul, sel_mulh = sel_by[0x02], sel_by[0x03]
    sel_divf = selsum((0x04, 0x05, 0x06, 0x07))
    sel_mulf = _add2(sel_mul, sel_mulh)
    sel_md = _add2(sel_mulf, sel_divf)
    xq = [cval(row, COL_XQ0 + i) for i in range(4)]
    yq = [cval(row, COL_YQ0 + i) for i in range(4)]
    pl = [cval(row, COL_PL0 + i) for i in range(4)]
    dr = [cval(row, COL_DR0 + i) for i in range(4)]
    uc = [cval(row, COL_U0 + i) for i in range(4)]

    def comb2(c0v, c1v):
        return _add2(c0v, cm31_mul_scalar(c1v, (1 << 10, 0)))

    xq_lo, xq_hi = comb2(xq[0], xq[1]), comb2(xq[2], xq[3])
    yq_lo, yq_hi = comb2(yq[0], yq[1]), comb2(yq[2], yq[3])
    dr_lo, dr_hi = comb2(dr[0], dr[1]), comb2(dr[2], dr[3])
    pl_lo, pl_hi = comb2(pl[0], pl[1]), comb2(pl[2], pl[3])
    u_lo, u_hi = comb2(uc[0], uc[1]), comb2(uc[2], uc[3])
    singles.append(cm31_mul_scalar(sel_mulf, _sub2(va_lo, xq_lo)))
    singles.append(cm31_mul_scalar(sel_mulf, _sub2(va_hi, xq_hi)))
    singles.append(cm31_mul_scalar(sel_md, _sub2(vb_lo, yq_lo)))
    singles.append(cm31_mul_scalar(sel_md, _sub2(vb_hi, yq_hi)))
    sel_qres = _add2(sel_by[0x04], sel_by[0x06])
    singles.append(cm31_mul_scalar(sel_qres, _sub2(res_lo, xq_lo)))
    singles.append(cm31_mul_scalar(sel_qres, _sub2(res_hi, xq_hi)))
    sel_rres = _add2(sel_by[0x05], sel_by[0x07])
    singles.append(cm31_mul_scalar(sel_rres, _sub2(res_lo, dr_lo)))
    singles.append(cm31_mul_scalar(sel_rres, _sub2(res_hi, dr_hi)))
    kvals = [cval(row, COL_K0)]
    for cc, bits in ((COL_K1C, 1), (COL_K2C, 2), (COL_K3C, 2),
                     (COL_K4C, 2), (COL_K5C, 2), (COL_K6C, 1)):
        b0v = cval(row, cc + 1)
        singles.append(cm31_mul_scalar(b0v, _sub2(b0v, one)))
        hi_part = b0v
        if bits == 2:
            b1v = cval(row, cc + 2)
            singles.append(cm31_mul_scalar(b1v, _sub2(b1v, one)))
            hi_part = _add2(b0v, cm31_mul_scalar(b1v, (2, 0)))
        kvals.append(_add2(cval(row, cc),
                           cm31_mul_scalar(hi_part, (1 << 10, 0))))
    s_sums = []
    for t in range(7):
        acc = (0, 0)
        for i in range(4):
            j = t - i
            if 0 <= j < 4:
                acc = _add2(acc, cm31_mul_scalar(xq[i], yq[j]))
        s_sums.append(acc)
    res_ch = [cval(row, COL_RES_CH0 + i) for i in range(4)]
    sel_plchain = _add2(sel_mulh, sel_divf)
    for t in range(4):
        base_e = s_sums[t] if t == 0 else _add2(s_sums[t], kvals[t - 1])
        k_sh = cm31_mul_scalar(kvals[t], (1 << 10, 0))
        singles.append(cm31_mul_scalar(sel_mul, _sub2(
            base_e, _add2(res_ch[t], k_sh))))
        singles.append(cm31_mul_scalar(sel_plchain, _sub2(
            base_e, _add2(pl[t], k_sh))))
    for t in range(4, 7):
        base_e = _add2(s_sums[t], kvals[t - 1])
        singles.append(cm31_mul_scalar(sel_mulh, _sub2(
            base_e, _add2(res_ch[t - 4],
                          cm31_mul_scalar(kvals[t], (1 << 10, 0))))))
    singles.append(cm31_mul_scalar(sel_mulh, _sub2(res_ch[3], kvals[6])))
    singles.append(cm31_mul_scalar(sel_divf, _add2(s_sums[4], kvals[3])))
    singles.append(cm31_mul_scalar(sel_divf, s_sums[5]))
    singles.append(cm31_mul_scalar(sel_divf, s_sums[6]))
    cd0, e0 = cval(row, COL_CD0), cval(row, COL_E0)
    singles.append(cm31_mul_scalar(cd0, _sub2(cd0, one)))
    singles.append(cm31_mul_scalar(e0, _sub2(e0, one)))
    singles.append(cm31_mul_scalar(sel_divf, _sub2(
        _add2(pl_lo, dr_lo),
        _add2(va_lo, cm31_mul_scalar(cd0, (1 << 20, 0))))))
    singles.append(cm31_mul_scalar(sel_divf, _sub2(
        _add2(_add2(pl_hi, dr_hi), cd0), va_hi)))
    singles.append(cm31_mul_scalar(sel_divf, _sub2(
        _add2(_add2(u_lo, one), dr_lo),
        _add2(vb_lo, cm31_mul_scalar(e0, (1 << 20, 0))))))
    singles.append(cm31_mul_scalar(sel_divf, _sub2(
        _add2(_add2(u_hi, dr_hi), e0), vb_hi)))

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

    for r in range(1, 16):
        we = cm31_mul_scalar(w, e[r])
        transitions.append(cm31_mul_scalar(
            we, _sub2(cval(next_row, COL_REG_LO + r), res_lo)))
        transitions.append(cm31_mul_scalar(
            we, _sub2(cval(next_row, COL_REG_HI + r), res_hi)))

    sel_br = (0, 0)
    for v in BRANCH_OPS:
        sel_br = _add2(sel_br, sel_by[v])
    c2_sh = cm31_mul_scalar(c2, (1 << 20, 0))
    c3_sh = cm31_mul_scalar(c3, (1 << 20, 0))
    d_lo = _add2(cm31_mul_scalar(taken, i_lo),
                 cm31_mul_scalar(_sub2(one, taken), (4, 0)))
    transitions.append(cm31_mul_scalar(sel_br, _add2(
        _sub2(_sub2(cval(next_row, COL_PC_LO), pc_lo), d_lo), c2_sh)))
    transitions.append(cm31_mul_scalar(sel_br, _add2(
        _sub2(_sub2(_sub2(cval(next_row, COL_PC_HI), pc_hi),
                    cm31_mul_scalar(taken, i_hi)), c2), c3_sh)))
    jal_off = _add2(cm31_mul_scalar(cval(row, COL_IMM_LO), (16, 0)),
                    cval(row, COL_RS1))
    transitions.append(cm31_mul_scalar(sel_by[0x48], _add2(
        _sub2(_sub2(cval(next_row, COL_PC_LO), pc_lo), jal_off), c2_sh)))
    transitions.append(cm31_mul_scalar(sel_by[0x48], _add2(
        _sub2(_sub2(_sub2(cval(next_row, COL_PC_HI), pc_hi),
                    cm31_mul_scalar(s_imm, (0xFFFFE, 0))), c2), c3_sh)))
    transitions.append(cm31_mul_scalar(sel_by[0x49], _add2(_add2(
        _sub2(_sub2(cval(next_row, COL_PC_LO), a_lo), i_lo), b_lsb),
        c2_sh)))
    transitions.append(cm31_mul_scalar(sel_by[0x49], _add2(
        _sub2(_sub2(_sub2(cval(next_row, COL_PC_HI), a_hi), i_hi), c2),
        c3_sh)))

    # Halt chain (scalar mirror).
    sel_eb_next = cval(next_row, COL_SEL0 + OP_VALUES.index(0x51))
    transitions.append(cm31_mul_scalar(sel_eb, _sub2(one, sel_eb_next)))
    transitions.append(cm31_mul_scalar(cm31_mul_scalar(sel_ec, eex),
                                       _sub2(one, sel_eb_next)))
    ec_adv = cm31_mul_scalar(sel_ec, _sub2(one, eex))
    transitions.append(cm31_mul_scalar(ec_adv, t1))
    transitions.append(cm31_mul_scalar(ec_adv, t2))

    firsts = [cval(row, base + r)
              for r in range(1, 16) for base in (COL_REG_LO, COL_REG_HI)]
    return singles, transitions, firsts


def lookup_constraint_values_at(row, next_row, s_row, s_next, n_cols: int,
                                beta: Tuple[int, int],
                                n_sums: int = NUM_LOOKUP):
    """Scalar LogUp constraint values from opened rows.

    ``s_row``/``s_next`` are the opened partial-sum rows: CM31 layout
    [re x n_sums, im x n_sums] (n_sums > NUM_LOOKUP when the program
    channel is present)."""

    def cval(cols, c):
        return (cols[c], cols[n_cols + c])

    def sval(cols, k):
        return (cols[k], cols[n_sums + k])

    t = cval(row, COL_TABLE)
    bt = _sub2(beta, t)

    out = []
    for k, (_, const, terms) in enumerate(CHANNELS):
        w = (const % P, 0)
        for c, coef in terms:
            w = _add2(w, cm31_mul_scalar(cval(row, c), (coef % P, 0)))
        m = cval(row, COL_MULT0 + k)
        s = sval(s_row, k)
        s_n = sval(s_next, k)
        bw = _sub2(beta, w)
        lhs = cm31_mul_scalar(cm31_mul_scalar(_sub2(s_n, s), bw), bt)
        rhs = _sub2(bt, cm31_mul_scalar(m, bw))
        out.append(_sub2(lhs, rhs))
    return out


def quotient_value_at(row, next_row, n_cols: int, index: int, log_n: int,
                      log_blowup: int, shift: Tuple[int, int],
                      alpha: Tuple[int, int], lookup=None, program=None,
                      memory=None):
    """Scalar Q(x_index) recomputed from opened rows (verifier side).

    ``lookup``: optional (s_row, s_next, beta).
    ``memory``: optional (delta,); its partial sum is sums column
    NUM_LOOKUP.
    ``program``: optional (prog_row, gamma, entry); its partial sum is
    the last sums column."""
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
        n_sums = (NUM_LOOKUP + (1 if memory is not None else 0)
                  + (1 if program is not None else 0))
        for c in lookup_constraint_values_at(row, next_row, s_row, s_next,
                                             n_cols, beta, n_sums=n_sums):
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
    if memory is not None:
        (delta,) = memory
        s_row, s_next, beta = lookup
        n_sums = (NUM_LOOKUP + 1 + (1 if program is not None else 0))
        m_singles, m_trans, m_firsts = memory_constraint_values_at(
            row, next_row, n_cols)
        for cs, dinv in ((m_singles, zh_inv), (m_trans, zt_inv),
                         (m_firsts, zf_inv)):
            for c in cs:
                acc = _add2(acc, cm31_mul_scalar(
                    cm31_mul_scalar(c, dinv), power))
                power = cm31_mul_scalar(power, alpha)

        def cval(cols, c):
            return (cols[c], cols[n_cols + c])

        def tuple6(cols, flag):
            acc6 = cval(row, cols[0])
            p6 = delta
            for c in cols[1:]:
                acc6 = _add2(acc6, cm31_mul_scalar(cval(row, c), p6))
                p6 = cm31_mul_scalar(p6, delta)
            return _add2(acc6, cm31_mul_scalar(flag, p6))

        sel_ld = cval(row, COL_SEL0 + OP_VALUES.index(0x35))
        sel_sd = cval(row, COL_SEL0 + OP_VALUES.index(0x3B))
        v = _add2(sel_ld, sel_sd)
        w = tuple6((COL_MEM_ADDR_LO, COL_MEM_ADDR_HI, COL_CLK,
                    COL_MEM_VAL_LO, COL_MEM_VAL_HI), sel_sd)
        t_mem = tuple6((M_ADDR_LO, M_ADDR_HI, M_CLK, M_VAL_LO, M_VAL_HI),
                       cval(row, M_W))
        m_real = cval(row, M_REAL)
        s = (s_row[NUM_LOOKUP], s_row[n_sums + NUM_LOOKUP])
        s_n = (s_next[NUM_LOOKUP], s_next[n_sums + NUM_LOOKUP])
        bw = _sub2(beta, w)
        bt = _sub2(beta, t_mem)
        lhs = cm31_mul_scalar(cm31_mul_scalar(_sub2(s_n, s), bw), bt)
        rhs = _sub2(cm31_mul_scalar(v, bt), cm31_mul_scalar(m_real, bw))
        acc = _add2(acc, cm31_mul_scalar(
            cm31_mul_scalar(_sub2(lhs, rhs), zh_inv), power))
        power = cm31_mul_scalar(power, alpha)
    if program is not None:
        prog_row, gamma, entry = program
        s_row, s_next, beta = lookup
        n_sums = (NUM_LOOKUP + 1 + (1 if memory is not None else 0))

        def cval(cols, c):
            return (cols[c], cols[n_cols + c])

        def pval(c):
            return (prog_row[c], prog_row[4 + c])

        g2 = cm31_mul_scalar(gamma, gamma)
        g3 = cm31_mul_scalar(g2, gamma)
        f = (0, 0)
        for c, coef in PROG_F_TERMS:
            f = _add2(f, cm31_mul_scalar(cval(row, c), (coef, 0)))
        w = _add2(_add2(cval(row, COL_PC_LO),
                        cm31_mul_scalar(cval(row, COL_PC_HI), gamma)),
                  _add2(cm31_mul_scalar(f, g2),
                        cm31_mul_scalar(cval(row, COL_IMM_LO), g3)))
        t_prog = _add2(_add2(pval(0), cm31_mul_scalar(pval(1), gamma)),
                       _add2(cm31_mul_scalar(pval(2), g2),
                             cm31_mul_scalar(pval(3), g3)))
        m = cval(row, COL_PROG_M)
        idx_prog = n_sums - 1
        s = (s_row[idx_prog], s_row[n_sums + idx_prog])
        s_n = (s_next[idx_prog], s_next[n_sums + idx_prog])
        bw = _sub2(beta, w)
        bt = _sub2(beta, t_prog)
        lhs = cm31_mul_scalar(cm31_mul_scalar(_sub2(s_n, s), bw), bt)
        rhs = _sub2(bt, cm31_mul_scalar(m, bw))
        acc = _add2(acc, cm31_mul_scalar(
            cm31_mul_scalar(_sub2(lhs, rhs), zh_inv), power))
        power = cm31_mul_scalar(power, alpha)

        e_lo = entry & ((1 << 20) - 1)
        e_hi = (entry >> 20) & ((1 << 20) - 1)
        for c_idx, e_val in ((COL_PC_LO, e_lo), (COL_PC_HI, e_hi)):
            c = _sub2(cval(row, c_idx), (e_val, 0))
            acc = _add2(acc, cm31_mul_scalar(
                cm31_mul_scalar(c, zf_inv), power))
            power = cm31_mul_scalar(power, alpha)
    return acc


def _add2(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def _sub2(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)
