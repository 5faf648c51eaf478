"""Prover-stage checkpointing (elastic recovery, SURVEY §5): a killed
prove resumes past completed stages and emits a bit-identical proof.
"""

import json

import numpy as np
import pytest

import zkir_tpu.prover.prover as PP
from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import FriConfig, prove_trace, trace_to_matrix, \
    verify_trace
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(num_queries=4, grinding_bits=2, min_security=0)


def _matrix():
    program = Program.from_instructions([
        Instruction(Op.ADDI, rd=1, rs1=0, imm=7),
        Instruction(Op.ADD, rd=2, rs1=2, rs2=1),
        Instruction(Op.SW, rs1=0, rs2=2, imm=0x3000),
        Instruction(Op.LW, rd=3, rs1=0, imm=0x3000),
        Instruction(Op.EBREAK),
    ])
    interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=16,
                                                  collect_trace=True))
    return trace_to_matrix(interp.run([[]], max_cycles=16)["trace"])


def _canon(proof):
    p = dict(proof)
    p["fri"] = dict(proof["fri"])
    p["fri"]["config"] = repr(proof["fri"]["config"])
    return json.dumps(p, sort_keys=True, default=int)


class TestCheckpointResume:
    def test_resume_after_kill_is_bit_identical(self, tmp_path, monkeypatch):
        matrix = _matrix()
        ckdir = str(tmp_path / "ck")

        baseline = prove_trace(matrix, CFG, range_lookup=True)

        # First attempt dies mid-FRI (after the quotient stage persisted).
        real_fri = PP.fri_prove

        def killed(*a, **k):
            raise KeyboardInterrupt("simulated kill mid-FRI")

        monkeypatch.setattr(PP, "fri_prove", killed)
        with pytest.raises(KeyboardInterrupt):
            prove_trace(matrix, CFG, range_lookup=True,
                        checkpoint_dir=ckdir)
        monkeypatch.setattr(PP, "fri_prove", real_fri)

        # Stages up to the quotient were persisted.
        stages = {p.name.split(".")[-2] for p in (tmp_path / "ck").iterdir()}
        assert {"commit", "sums", "quotient"} <= stages

        # The rerun must NOT redo the LDE or the quotient: poison both.
        def no_lde(*a, **k):
            raise AssertionError("LDE recomputed on resume")

        monkeypatch.setattr(PP, "lde", no_lde)
        monkeypatch.setattr(PP, "quotient_evals", no_lde)
        resumed = prove_trace(matrix, CFG, range_lookup=True,
                              checkpoint_dir=ckdir)

        assert _canon(resumed) == _canon(baseline)
        assert verify_trace(resumed)

    def test_full_checkpointed_prove_matches_plain(self, tmp_path):
        matrix = _matrix()
        plain = prove_trace(matrix, CFG, range_lookup=True)
        ck = prove_trace(matrix, CFG, range_lookup=True,
                         checkpoint_dir=str(tmp_path))
        again = prove_trace(matrix, CFG, range_lookup=True,
                            checkpoint_dir=str(tmp_path))
        assert _canon(plain) == _canon(ck) == _canon(again)

    def test_key_binds_inputs(self, tmp_path):
        matrix = _matrix()
        prove_trace(matrix, CFG, range_lookup=True,
                    checkpoint_dir=str(tmp_path))
        n_files = len(list(tmp_path.iterdir()))
        # A different trace must not reuse the first trace's stages.
        other = matrix.copy()
        other[0, 8 + 1] ^= 1
        store = PP._StageStore(str(tmp_path), other, CFG, True, None)
        assert store.load("commit") is None
        assert len(list(tmp_path.iterdir())) == n_files

    def test_corrupt_stage_is_recomputed(self, tmp_path):
        matrix = _matrix()
        baseline = prove_trace(matrix, CFG, range_lookup=True,
                               checkpoint_dir=str(tmp_path))
        for p in tmp_path.iterdir():
            p.write_bytes(b"torn write garbage")
        redo = prove_trace(matrix, CFG, range_lookup=True,
                           checkpoint_dir=str(tmp_path))
        assert _canon(redo) == _canon(baseline)
