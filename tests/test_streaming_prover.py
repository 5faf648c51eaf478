"""Column-streaming prover: bit-identical proofs, bounded peak memory."""

import json

import numpy as np

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.streaming import prove_trace_streaming
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2,
                min_security=0)


def _matrix_and_prog(with_crypto=True):
    ins = [
        Instruction(Op.ADDI, rd=1, rs1=0, imm=3),
        Instruction(Op.ADDI, rd=2, rs1=0, imm=5),
        Instruction(Op.ADD, rd=3, rs1=1, rs2=2),
        Instruction(Op.MUL, rd=4, rs1=3, rs2=2),
        Instruction(Op.SW, rs1=0, rs2=4, imm=0x2000),
        Instruction(Op.LW, rd=5, rs1=0, imm=0x2000),
    ]
    if with_crypto:
        ins += [
            Instruction(Op.ADDI, rd=10, rs1=0, imm=3),
            Instruction(Op.ADDI, rd=11, rs1=0, imm=0x2000),
            Instruction(Op.ADDI, rd=12, rs1=0, imm=8),
            Instruction(Op.ADDI, rd=13, rs1=0, imm=0x2100),
            Instruction(Op.ECALL),
        ]
    ins.append(Instruction(Op.EBREAK))
    prog = Program.from_instructions(ins)
    interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=16,
                                               collect_trace=True))
    return trace_to_matrix(interp.run([[]])["trace"], program=prog), prog


def test_streaming_bit_identical_and_verifies():
    matrix, prog = _matrix_and_prog()
    ref = prove_trace(matrix, CFG, range_lookup=True, program=prog)
    st = prove_trace_streaming(matrix, CFG, program=prog, col_block=37)
    assert json.dumps(st, default=str, sort_keys=True) == \
        json.dumps(ref, default=str, sort_keys=True)
    assert verify_trace(st, program=prog)


def test_streaming_block_size_invariant():
    matrix, prog = _matrix_and_prog(with_crypto=False)
    a = prove_trace_streaming(matrix, CFG, program=prog, col_block=16)
    b = prove_trace_streaming(matrix, CFG, program=prog, col_block=512)
    assert a["trace_root"] == b["trace_root"]
    assert a["fri"]["roots"] == b["fri"]["roots"]


def test_streaming_rejects_forged_trace():
    matrix, prog = _matrix_and_prog(with_crypto=False)
    bad = matrix.copy()
    bad[2, 8 + 3] ^= 1   # corrupt a register value
    import pytest

    from zkir_tpu.prover.prover import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        prove_trace_streaming(bad, CFG, program=prog)


def test_streaming_mesh_bit_identical():
    """Sharded-streaming == single-device streaming (round-5 ask #3):
    the commit passes shard NTTs over columns and sponge hashing over
    rows with a device_put transpose between them; exact integer field
    math means the proof must be BIT-identical, not just valid."""
    from zkir_tpu.parallel import make_mesh

    matrix, prog = _matrix_and_prog(with_crypto=False)
    ref = prove_trace_streaming(matrix, CFG, program=prog, col_block=256)
    st = prove_trace_streaming(matrix, CFG, program=prog, col_block=256,
                               mesh=make_mesh(8))
    assert json.dumps(st, default=str, sort_keys=True) == \
        json.dumps(ref, default=str, sort_keys=True)
    assert verify_trace(st, program=prog)
