"""In-circuit LogUp range lookup: full multi-phase STARK tests."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.constraints import COL_CHUNK0
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program
from zkir_tpu.spec.field import M31_PRIME

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


@pytest.fixture(scope="module")
def rc_matrix():
    # Accumulating adds produce deferred range checks with real chunks.
    instrs = [I(Op.ADDI, rd=1, rs1=0, imm=(1 << 15) - 1)]
    instrs += [I(Op.ADD, rd=1, rs1=1, rs2=1)] * 30
    instrs += [I(Op.MUL, rd=2, rs1=1, rs2=1), I(Op.EBREAK)]
    interp = TpuInterpreter(Program.from_instructions(instrs),
                            InterpConfig(lanes=1, chunk=64,
                                         collect_trace=True))
    result = interp.run([[]])
    return trace_to_matrix(result["trace"])


def test_lookup_proof_roundtrip(rc_matrix):
    assert rc_matrix[:, COL_CHUNK0:COL_CHUNK0 + 4].any(), \
        "trace must contain non-zero chunks"
    proof = prove_trace(rc_matrix, CFG, range_lookup=True)
    assert proof["range_lookup"]
    assert proof["log_n"] >= 10  # full table needs 1024 rows
    assert verify_trace(proof)


def test_out_of_range_chunk_rejected(rc_matrix):
    bad = rc_matrix.copy()
    # Put a chunk value outside the 10-bit table on an active rc row.
    rows, cols = np.nonzero(bad[:, COL_CHUNK0:COL_CHUNK0 + 4])
    bad[rows[0], COL_CHUNK0 + cols[0]] = 1024
    proof = prove_trace(bad, CFG, range_lookup=True, selfcheck=False)
    assert not verify_trace(proof)


def test_tampered_sums_root_rejected(rc_matrix):
    proof = prove_trace(rc_matrix, CFG, range_lookup=True)
    proof["sums_root"][0] = (proof["sums_root"][0] + 1) % M31_PRIME
    assert not verify_trace(proof)


def test_forged_is_seq_rejected(rc_matrix):
    # Flip is_seq on a branch row (op >= 0x40): the derived witness
    # 16*op - 1024*(1 - is_seq) leaves the table -> lookup rejects.
    from zkir_tpu.prover.constraints import COL_IS_SEQ, COL_OPCODE
    bad = rc_matrix.copy()
    # Find a non-sequential committed row... this trace is pure ALU, so
    # fabricate: set a row's opcode to BEQ but keep is_seq = 1.
    bad[3, COL_OPCODE] = 0x40
    bad[3, COL_IS_SEQ] = 1
    proof = prove_trace(bad, CFG, range_lookup=True, selfcheck=False)
    assert not verify_trace(proof)


def test_forged_seq_flag_off_rejected(rc_matrix):
    # Claiming is_seq = 0 on a sequential op also leaves the table
    # (16*op - 1024 is negative mod p for op < 0x40).
    from zkir_tpu.prover.constraints import COL_IS_SEQ
    bad = rc_matrix.copy()
    assert bad[3, COL_IS_SEQ] == 1
    bad[3, COL_IS_SEQ] = 0
    proof = prove_trace(bad, CFG, range_lookup=True, selfcheck=False)
    assert not verify_trace(proof)
