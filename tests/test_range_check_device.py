"""Device range-check witness columns vs the oracle RangeCheckTracker."""

import numpy as np

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.runtime import VM, VMConfig
from zkir_tpu.spec import Instruction, Op, Program


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def test_device_rc_witnesses_match_oracle():
    # Accumulating adds overflow the 40-bit bound and defer range checks
    # (mirrors reference vm.rs:698-752).
    instrs = [I(Op.ADDI, rd=1, rs1=0, imm=(1 << 15) - 1)]
    instrs += [I(Op.ADD, rd=1, rs1=1, rs2=1)] * 30
    instrs += [
        I(Op.ADDI, rd=2, rs1=0, imm=0x1000),
        I(Op.SW, rs1=2, rs2=1, imm=0),   # checkpoint in the oracle
        I(Op.MUL, rd=3, rs1=1, rs2=1),
        I(Op.ADDI, rd=4, rs1=0, imm=0x2000),
        I(Op.SW, rs1=4, rs2=3, imm=0),
        I(Op.EBREAK),
    ]
    program = Program.from_instructions(instrs)

    vm = VM(program, [], VMConfig(enable_range_checking=True))
    oracle = vm.run()
    oracle_checks = [
        (value, tuple(chunks), pc)
        for witness in oracle.range_check_witnesses
        for (value, chunks, pc) in witness.checks
    ]
    assert oracle_checks, "oracle must defer checks in this program"

    interp = TpuInterpreter(program, InterpConfig(
        lanes=1, chunk=64, collect_trace=True))
    device = interp.run([[]])
    trace = device["trace"]
    idx = np.nonzero(trace["rc_valid"][:, 0])[0]
    device_checks = [
        (int(trace["rc_value"][i, 0]),
         tuple(int(c) for c in trace["rc_chunks"][i, 0]),
         int(trace["pc"][i, 0]))
        for i in idx
    ]
    assert device_checks == oracle_checks

    # Every chunk is a valid 10-bit table entry.
    for _, chunks, _ in device_checks:
        assert all(0 <= c < 1024 for c in chunks)
