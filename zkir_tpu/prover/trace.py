"""Execution trace -> AIR trace matrix over M31.

Converts the interpreter's columnar trace (or the oracle's TraceRow list)
into a 2-D matrix of M31 field elements, one row per cycle:

    [pc_lo, pc_hi, opcode, rd, rs1, rs2, imm_lo, imm_hi,
     16 x (reg limb0, reg limb1),
     mem_addr_lo, mem_addr_hi, mem_val_lo, mem_val_hi, mem_flags]

plus the AIR helper columns [is_seq, pc_carry] (see prover/constraints.py).

40-bit machine values split into 2 x 20-bit limbs (each < p); the 17-bit
immediate and memory metadata fit directly.  This is the matrix committed
by the prover (reference analogue: the TraceRow struct,
``zkir-spec/src/trace.rs:24-50``, reshaped struct-of-arrays).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_M20 = (1 << 20) - 1

N_COLUMNS = 8 + 32 + 5 + 2 + 4


def trace_to_matrix(trace: Dict[str, np.ndarray], lane: int = 0) -> np.ndarray:
    """Convert a device trace dict (from TpuInterpreter.run with
    collect_trace=True) into a uint32 [n_valid_rows, N_COLUMNS] matrix."""
    valid = np.nonzero(trace["valid"][:, lane])[0]
    n = len(valid)
    out = np.zeros((n, N_COLUMNS), dtype=np.uint32)

    pc = trace["pc"][valid, lane].astype(np.uint64)
    word = trace["word"][valid, lane].astype(np.uint64)
    out[:, 0] = (pc & _M20).astype(np.uint32)
    out[:, 1] = ((pc >> 20) & _M20).astype(np.uint32)
    out[:, 2] = (word & 0x7F).astype(np.uint32)
    out[:, 3] = ((word >> 7) & 0xF).astype(np.uint32)
    out[:, 4] = ((word >> 11) & 0xF).astype(np.uint32)
    out[:, 5] = ((word >> 15) & 0xF).astype(np.uint32)
    imm = (word >> 15) & 0x1FFFF
    out[:, 6] = (imm & _M20).astype(np.uint32)
    out[:, 7] = (imm >> 20).astype(np.uint32)

    regs = trace["regs"][valid, lane].astype(np.uint64)  # [n, 16]
    out[:, 8:8 + 16] = (regs & _M20).astype(np.uint32)
    out[:, 8 + 16:8 + 32] = ((regs >> 20) & _M20).astype(np.uint32)

    base = 8 + 32
    maddr = trace["mem_addr"][valid, lane].astype(np.uint64)
    mval = trace["mem_value"][valid, lane].astype(np.uint64)
    mvalid = trace["mem_valid"][valid, lane]
    out[:, base] = np.where(mvalid, maddr & _M20, 0).astype(np.uint32)
    out[:, base + 1] = np.where(mvalid, (maddr >> 20) & _M20, 0).astype(np.uint32)
    out[:, base + 2] = np.where(mvalid, mval & _M20, 0).astype(np.uint32)
    out[:, base + 3] = np.where(mvalid, (mval >> 20) & _M20, 0).astype(np.uint32)
    flags = (
        mvalid.astype(np.uint32)
        | (trace["mem_is_write"][valid, lane].astype(np.uint32) << 1)
        | (trace["mem_width"][valid, lane].astype(np.uint32) << 2)
    )
    out[:, base + 4] = flags

    # AIR helper columns (constraints.py): is_seq marks rows whose pc
    # advances by exactly 4 into the *next committed row* (non-control-flow
    # ops with a successor); pc_carry witnesses the 20-bit limb carry.
    op = out[:, 2]
    sequential = ~(
        ((op >= 0x40) & (op <= 0x45))   # branches
        | (op == 0x48) | (op == 0x49)   # JAL / JALR
        | (op == 0x50) | (op == 0x51)   # ECALL / EBREAK
    )
    if n > 0:
        sequential[-1] = False  # last committed row has no successor
    out[:, base + 5] = sequential.astype(np.uint32)
    carry = sequential & (out[:, 0] + 4 >= (1 << 20))
    out[:, base + 6] = carry.astype(np.uint32)

    # Range-check chunk columns (4 x 10-bit decomposition of deferred
    # ADD/MUL results; zero on rows without a deferral — 0 is in the
    # lookup table, accounted in the multiplicities).
    rc_valid = trace["rc_valid"][valid, lane]
    rc_chunks = trace["rc_chunks"][valid, lane].astype(np.uint32)  # [n, 4]
    for c in range(4):
        out[:, base + 7 + c] = np.where(rc_valid, rc_chunks[:, c], 0)
    return out
