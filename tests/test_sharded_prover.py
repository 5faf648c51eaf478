"""Mesh-sharded proving produces bit-identical proofs."""

import numpy as np

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.parallel import make_mesh
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2, min_security=0)


def _matrix():
    program = Program.from_instructions([
        Instruction(Op.ADDI, rd=1, rs1=0, imm=3),
        Instruction(Op.ADDI, rd=2, rs1=0, imm=5),
        Instruction(Op.ADD, rd=3, rs1=1, rs2=2),
        Instruction(Op.MUL, rd=4, rs1=3, rs2=2),
        Instruction(Op.EBREAK),
    ])
    interp = TpuInterpreter(program, InterpConfig(
        lanes=1, chunk=16, collect_trace=True))
    result = interp.run([[]])
    return trace_to_matrix(result["trace"])


def test_sharded_proof_matches_single_device():
    matrix = _matrix()
    single = prove_trace(matrix, CFG)
    mesh = make_mesh(8)
    sharded = prove_trace(matrix, CFG, mesh=mesh)
    assert sharded["trace_root"] == single["trace_root"]
    assert sharded["quotient_root"] == single["quotient_root"]
    assert sharded["fri"]["roots"] == single["fri"]["roots"]
    assert verify_trace(sharded)
