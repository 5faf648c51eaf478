"""I/O-tape AIR: ECALL READ/WRITE results bound to public tapes.

The io multiset channel (prover/constraints.py io_multiset) binds every
READ syscall's result (the next row's R10) and every WRITE syscall's
value (R11) to the proof's claimed public tapes, with running indices
forcing exact order; the syscall-number bit decomposition additionally
pins R10 <= 6 on ECALL rows and every non-READ non-EXIT syscall's R10
result to 0 (semantics source syscall.rs:18-97, 121-177)."""

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import FriConfig, prove_trace, trace_to_matrix, \
    verify_trace
from zkir_tpu.prover.prover import extract_io
from zkir_tpu.prover.trace import (COL_ERD, COL_IO_B0, COL_IO_B1,
                                   COL_IO_B2, COL_RIDX, COL_WIDX)
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4,
                grinding_bits=2, min_security=0)


def I(op, **kw):  # noqa: E743
    return Instruction(op, **kw)


def _run_matrix(instrs, inputs):
    prog = Program.from_instructions(instrs)
    interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=64,
                                               collect_trace=True))
    result = interp.run([inputs])
    return trace_to_matrix(result["trace"]), result


IO_PROGRAM = [
    I(Op.ADDI, rd=10, rs1=0, imm=1),   # READ -> r10
    I(Op.ECALL),
    I(Op.ADDI, rd=11, rs1=10, imm=5),  # r11 = input + 5
    I(Op.ADDI, rd=10, rs1=0, imm=2),   # WRITE r11
    I(Op.ECALL),
    I(Op.ADDI, rd=10, rs1=0, imm=1),   # READ past tape end -> 0
    I(Op.ECALL),
    I(Op.EBREAK),
]


@pytest.fixture(scope="module")
def io_proof():
    matrix, _ = _run_matrix(IO_PROGRAM, [37])
    return matrix, prove_trace(matrix, CFG, range_lookup=True)


class TestIoColumns:
    def test_flags_and_indices(self):
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        ec_rows = np.nonzero(matrix[:, 2] == 0x50)[0]
        assert len(ec_rows) == 3
        assert matrix[ec_rows[0], COL_ERD] == 1
        assert matrix[ec_rows[0], COL_IO_B0] == 1
        assert matrix[ec_rows[1], COL_IO_B1] == 1          # WRITE
        assert matrix[ec_rows[2], COL_ERD] == 1
        assert matrix[ec_rows[2], COL_RIDX] == 1           # second read
        assert matrix[-1, COL_RIDX] == 2
        assert matrix[-1, COL_WIDX] == 1

    def test_extract_io(self):
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        inputs, outputs = extract_io(matrix)
        assert inputs == [37, 0]       # exhausted tape reads 0
        assert outputs == [42]


class TestIoBinding:
    def test_honest_proof_carries_tapes_and_verifies(self, io_proof):
        _, proof = io_proof
        assert proof["io"]["inputs"] == [37, 0]
        assert proof["io"]["outputs"] == [42]
        assert verify_trace(proof)

    def test_tampered_claimed_input_rejected(self, io_proof):
        _, proof = io_proof
        import copy
        bad = copy.deepcopy(proof)
        bad["io"]["inputs"][0] = 38
        assert not verify_trace(bad)

    def test_tampered_claimed_output_rejected(self, io_proof):
        _, proof = io_proof
        import copy
        bad = copy.deepcopy(proof)
        bad["io"]["outputs"][0] = 41
        assert not verify_trace(bad)

    def test_dropped_read_rejected(self, io_proof):
        _, proof = io_proof
        import copy
        bad = copy.deepcopy(proof)
        del bad["io"]["inputs"][1]
        assert not verify_trace(bad)

    def test_missing_io_rejected(self, io_proof):
        _, proof = io_proof
        bad = dict(proof)
        del bad["io"]
        assert not verify_trace(bad)


class TestForgedTraces:
    def test_forged_read_result_rejected(self):
        """A prover whose trace returns a forged READ result (R10 after
        the READ row) contradicts the tape it must claim."""
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        ec = np.nonzero(matrix[:, 2] == 0x50)[0][0]
        forged = matrix.copy()
        # Change the read result from row ec+1 onward (R10 lo limb);
        # the register file carries it until the next R10 write.
        forged[ec + 1, 8 + 10] = 99
        with np.errstate(all="ignore"):
            proof = prove_trace(forged, CFG, range_lookup=True, selfcheck=False)
        # The claimed input is now 99 -- the proof verifies only as
        # "input was 99", never as "input was 37".
        assert proof["io"]["inputs"][0] == 99
        import copy
        as37 = copy.deepcopy(proof)
        as37["io"]["inputs"][0] = 37
        assert not verify_trace(as37)

    def test_forged_write_result_rejected(self):
        """WRITE syscalls leave R10 untouched (syscall.rs:114-119); a
        trace where R10 changes across a WRITE ECALL is rejected."""
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        wr = np.nonzero(matrix[:, 2] == 0x50)[0][1]
        forged = matrix.copy()
        forged[wr + 1:, 8 + 10] = 7     # pretend WRITE returned 7
        # keep later rows consistent: row wr+1 is ADDI rd=10 imm=1, so
        # only the single row after the WRITE ECALL actually changes.
        forged[wr + 2:, 8 + 10] = matrix[wr + 2:, 8 + 10]
        proof = prove_trace(forged, CFG, range_lookup=True, selfcheck=False)
        assert not verify_trace(proof)

    def test_forged_erd_flag_rejected(self):
        """Clearing the READ flag (to skip tape accounting while still
        changing R10) violates the erd bit pin."""
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        ec = np.nonzero(matrix[:, 2] == 0x50)[0][0]
        forged = matrix.copy()
        forged[ec, COL_ERD] = 0
        # ridx chain must match the forged flag or it fails trivially.
        forged[ec + 1:, COL_RIDX] = matrix[ec + 1:, COL_RIDX] - 1
        proof = prove_trace(forged, CFG, range_lookup=True, selfcheck=False)
        assert not verify_trace(proof)

    def test_invalid_syscall_number_rejected(self):
        """An ECALL row with R10 = 7 (InvalidSyscall) cannot satisfy the
        b0 b1 b2 = 0 cap."""
        matrix, _ = _run_matrix(IO_PROGRAM, [37])
        ec = np.nonzero(matrix[:, 2] == 0x50)[0][0]
        forged = matrix.copy()
        forged[ec, 8 + 10] = 7
        forged[ec, COL_IO_B0] = 1
        forged[ec, COL_IO_B1] = 1
        forged[ec, COL_IO_B2] = 1
        forged[ec, COL_ERD] = 0
        forged[ec + 1:, COL_RIDX] = matrix[ec + 1:, COL_RIDX] - 1
        proof = prove_trace(forged, CFG, range_lookup=True, selfcheck=False)
        assert not verify_trace(proof)
