"""Crypto syscalls are provable: the round-1..3 completeness hole.

The reference executes SHA/Keccak/Blake3 syscalls with memory effects
(zkir-runtime/src/syscall.rs:121-177) but has no prover; rounds 1-3 of
this framework executed them but could not prove them.  These tests pin
the closed gap: a program that hashes memory and then LOADS the digest
proves and verifies, for all four algorithms; forged digests, forged
tapes, and out-of-domain syscalls are rejected.
"""

import hashlib

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.prover import prove_trace, trace_to_matrix, verify_trace
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.prover import ConstraintViolation, extract_crypto_tape
from zkir_tpu.prover.trace import (COL_CWD0, COL_ECR, crypto_digest)
from zkir_tpu.spec import Instruction, Op, Program

CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4, grinding_bits=2,
                min_security=0)
PTR, OUT = 0x4000, 0x4100


def _hash_program(num, data: bytes, out=OUT, load_word=True):
    """Store ``data`` at PTR byte-by-byte, syscall-hash it, optionally
    load the first digest word into r5."""
    ins = [Instruction(Op.ADDI, rd=11, rs1=0, imm=PTR)]
    for i, b in enumerate(data):
        ins.append(Instruction(Op.ADDI, rd=6, rs1=0, imm=b))
        ins.append(Instruction(Op.SB, rs1=11, rs2=6, imm=i))
    ins += [
        Instruction(Op.ADDI, rd=10, rs1=0, imm=num),
        Instruction(Op.ADDI, rd=12, rs1=0, imm=len(data)),
        Instruction(Op.ADDI, rd=13, rs1=0, imm=out),
    ]
    ins.append(Instruction(Op.ECALL))
    if load_word:
        ins.append(Instruction(Op.LW, rd=5, rs1=13, imm=0))
    ins.append(Instruction(Op.EBREAK))
    return Program.from_instructions(ins)


def _run_matrix(prog):
    interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=16,
                                               collect_trace=True))
    res = interp.run([[]])
    return res, trace_to_matrix(res["trace"], program=prog)


class TestCryptoProvable:
    def test_sha256_abc_proves_and_digest_loads(self):
        prog = _hash_program(3, b"abc")
        res, m = _run_matrix(prog)
        # Runtime loaded the true first digest word (BE word of sha256).
        want = int.from_bytes(hashlib.sha256(b"abc").digest()[:4], "big")
        assert res["regs"][0][5] == want
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert proof["crypto"][0]["num"] == 3
        assert proof["crypto"][0]["len"] == 3
        assert bytes(proof["crypto"][0]["msg"][:3]) == b"abc"
        assert verify_trace(proof, program=prog)

    @pytest.mark.parametrize("num", [4, 5, 6])
    def test_other_algorithms_prove(self, num):
        prog = _hash_program(num, b"hi")
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert verify_trace(proof, program=prog)

    def test_empty_message(self):
        prog = _hash_program(3, b"")
        res, m = _run_matrix(prog)
        want = int.from_bytes(hashlib.sha256(b"").digest()[:4], "big")
        assert res["regs"][0][5] == want
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert verify_trace(proof, program=prog)

    def test_max_len_56(self):
        data = bytes(range(56))
        prog = _hash_program(3, data)
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert proof["crypto"][0]["len"] == 56
        assert verify_trace(proof, program=prog)

    def test_hash_in_place_overlap(self):
        # Output region inside the input region: reads (ts 2clk+1) chain
        # before writes (2clk+2) within the same cycle.
        prog = _hash_program(3, b"overlap!", out=PTR)
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert verify_trace(proof, program=prog)

    def test_two_syscalls_chain(self):
        # Hash, then hash the digest (reads the first call's writes).
        ins = [
            Instruction(Op.ADDI, rd=10, rs1=0, imm=3),
            Instruction(Op.ADDI, rd=11, rs1=0, imm=PTR),
            Instruction(Op.ADDI, rd=12, rs1=0, imm=0),
            Instruction(Op.ADDI, rd=13, rs1=0, imm=OUT),
            Instruction(Op.ECALL),
            Instruction(Op.ADDI, rd=10, rs1=0, imm=3),  # result cleared r10
            Instruction(Op.ADDI, rd=11, rs1=0, imm=OUT),
            Instruction(Op.ADDI, rd=12, rs1=0, imm=32),
            Instruction(Op.ADDI, rd=13, rs1=0, imm=OUT + 32),
            Instruction(Op.ECALL),
            Instruction(Op.LW, rd=5, rs1=13, imm=0),
            Instruction(Op.EBREAK),
        ]
        prog = Program.from_instructions(ins)
        res, m = _run_matrix(prog)
        img1 = crypto_digest(3, b"")
        img2 = crypto_digest(3, img1)
        assert res["regs"][0][5] == int.from_bytes(img2[:4], "little")
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        tape = proof["crypto"]
        assert len(tape) == 2
        assert bytes(tape[1]["msg"][:32]) == img1
        assert verify_trace(proof, program=prog)


class TestCryptoAdversarial:
    def test_forged_digest_byte_rejected(self):
        prog = _hash_program(3, b"abc", load_word=False)
        _res, m = _run_matrix(prog)
        row = int(np.nonzero(m[:, COL_ECR])[0][0])
        bad = m.copy()
        bad[row, COL_CWD0] ^= 1      # flip one digest byte everywhere
        # consistent with its own memory table -> all AIR identities
        # except the verifier-recomputed tape demand hold.
        with pytest.raises(ConstraintViolation):
            prove_trace(bad, CFG, range_lookup=True, program=prog)
        proof = prove_trace(bad, CFG, range_lookup=True, program=prog,
                            selfcheck=False)
        assert not verify_trace(proof, program=prog)

    def test_tampered_tape_msg_rejected(self):
        prog = _hash_program(3, b"abc")
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"][0]["msg"][0] ^= 1
        assert not verify_trace(proof, program=prog)

    def test_tampered_tape_len_rejected(self):
        prog = _hash_program(3, b"abc")
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"][0]["len"] = 2
        assert not verify_trace(proof, program=prog)

    def test_dropped_tape_entry_rejected(self):
        prog = _hash_program(3, b"abc")
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"] = []
        assert not verify_trace(proof, program=prog)

    def test_malformed_tape_rejected(self):
        prog = _hash_program(3, b"abc")
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"][0]["num"] = 7
        assert not verify_trace(proof, program=prog)


class TestCompletenessDomain:
    def test_unaligned_ptr_raises(self):
        ins = [
            Instruction(Op.ADDI, rd=10, rs1=0, imm=3),
            Instruction(Op.ADDI, rd=11, rs1=0, imm=PTR + 1),
            Instruction(Op.ADDI, rd=12, rs1=0, imm=4),
            Instruction(Op.ADDI, rd=13, rs1=0, imm=OUT),
            Instruction(Op.ECALL),
            Instruction(Op.EBREAK),
        ]
        prog = Program.from_instructions(ins)
        interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=16,
                                                   collect_trace=True))
        res = interp.run([[]])
        with pytest.raises(ValueError, match="unaligned"):
            trace_to_matrix(res["trace"], program=prog)

    def test_len_over_total_cap_raises(self):
        # len <= 56 was the round-4 ceiling; multi-block chaining lifted
        # it to CRYPTO_MAX_TOTAL (64 KB).  Beyond THAT still raises.
        ins = [
            Instruction(Op.ADDI, rd=10, rs1=0, imm=5),   # keccak
            Instruction(Op.ADDI, rd=11, rs1=0, imm=PTR),
            Instruction(Op.ADDI, rd=12, rs1=0, imm=1),
            Instruction(Op.SLLI, rd=12, rs1=12, imm=17),  # 131072 B
            Instruction(Op.ADDI, rd=13, rs1=0, imm=OUT),
            Instruction(Op.ECALL),
            Instruction(Op.EBREAK),
        ]
        prog = Program.from_instructions(ins)
        interp = TpuInterpreter(prog, InterpConfig(lanes=1, chunk=16,
                                                   collect_trace=True))
        res = interp.run([[]])
        with pytest.raises(ValueError, match="provable domain"):
            trace_to_matrix(res["trace"], program=prog)


class TestMultiBlockChaining:
    """len > 56 proves via adjacent chunk rows (round-5 upgrade; layout
    comment at trace.py CR_BASE): pc/registers frozen across the chain,
    slot keys advance 7 cells per chunk, crem forces the chain length
    from R12, and the verifier reassembles the message from consecutive
    tape entries before re-hashing."""

    def test_100_byte_sha256_chain(self):
        data = bytes((i * 7 + 3) & 0xFF for i in range(100))
        prog = _hash_program(3, data)
        res, m = _run_matrix(prog)
        want = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
        assert res["regs"][0][5] == want
        from zkir_tpu.prover.trace import COL_CBLK, COL_CMORE, COL_CREM
        crows = np.nonzero(m[:, COL_ECR])[0]
        assert len(crows) == 2 and crows[1] == crows[0] + 1
        assert list(m[crows, COL_CMORE]) == [1, 0]
        assert list(m[crows, COL_CBLK]) == [0, 1]
        assert list(m[crows, COL_CREM]) == [100, 44]
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert len(proof["crypto"]) == 2
        assert verify_trace(proof, program=prog)

    def test_1kb_sha256_chain(self):
        data = bytes((i * 31 + 7) & 0xFF for i in range(1024))
        prog = _hash_program(3, data)
        res, m = _run_matrix(prog)
        want = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
        assert res["regs"][0][5] == want
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert len(proof["crypto"]) == -(-1024 // 56)   # 19 chunk rows
        assert verify_trace(proof, program=prog)

    def test_keccak_two_chunks(self):
        data = bytes(range(60))
        prog = _hash_program(5, data, load_word=False)
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        assert verify_trace(proof, program=prog)

    def test_forged_intermediate_chunk_rejected(self):
        data = bytes((i * 7 + 3) & 0xFF for i in range(100))
        prog = _hash_program(3, data)
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"][0]["msg"][5] ^= 1
        assert not verify_trace(proof, program=prog)

    def test_forged_chain_structure_rejected(self):
        data = bytes((i * 7 + 3) & 0xFF for i in range(100))
        prog = _hash_program(3, data)
        _res, m = _run_matrix(prog)
        proof = prove_trace(m, CFG, range_lookup=True, program=prog)
        proof["crypto"][1]["more"] = 1      # dangling chain
        assert not verify_trace(proof, program=prog)


def test_extract_crypto_tape_matches_proof():
    prog = _hash_program(3, b"xyz")
    _res, m = _run_matrix(prog)
    tape = extract_crypto_tape(m)
    proof = prove_trace(m, CFG, range_lookup=True, program=prog)
    assert proof["crypto"] == tape
