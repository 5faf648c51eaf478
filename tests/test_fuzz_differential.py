"""Property-based differential fuzzing of random instruction streams.

Three engines must agree on every generated program: the scalar oracle
VM (`runtime/vm.py`, semantic port of execute.rs), the native C++ VM
(`native/zkir_vm.cpp`), and the batched TPU interpreter
(`interp/columnar.py`).  The generator goes beyond the reference's
straight-line stress programs (stress_tests.rs): it emits structured
control flow (forward branches, forward JALs, bounded counted loops),
guarded DIV/REM, all memory widths, and READ/WRITE syscalls, and is a
pure function of the seed.

An in-tree corpus (`fuzz_corpus.json`) pins the oracle's digest for 64
seeds so behavior regressions are caught even when both engines drift
together.  Regenerate with `python tests/test_fuzz_differential.py`.
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

from zkir_tpu.interp import InterpConfig, TpuInterpreter
from zkir_tpu.runtime import VM, VMConfig, HaltReason
from zkir_tpu.runtime import native_vm
from zkir_tpu.spec import Instruction, Op, Program

CORPUS = pathlib.Path(__file__).resolve().parent / "fuzz_corpus.json"

ALU_OPS = [
    Op.ADD, Op.SUB, Op.MUL, Op.MULH, Op.AND, Op.OR, Op.XOR,
    Op.SLL, Op.SRL, Op.SRA, Op.SLT, Op.SLTU, Op.SGE, Op.SGEU,
    Op.SEQ, Op.SNE, Op.CMOV, Op.CMOVZ, Op.CMOVNZ,
]
IMM_OPS = [Op.ADDI, Op.ANDI, Op.ORI, Op.XORI]
SHIFT_I_OPS = [Op.SLLI, Op.SRLI, Op.SRAI]
DIV_OPS = [Op.DIV, Op.DIVU, Op.REM, Op.REMU]
STORE_OPS = [Op.SB, Op.SH, Op.SW, Op.SD]
LOAD_OPS = [Op.LB, Op.LBU, Op.LH, Op.LHU, Op.LW, Op.LD]
BRANCH_OPS = [Op.BEQ, Op.BNE, Op.BLT, Op.BGE, Op.BLTU, Op.BGEU]

I = Instruction  # noqa: E741


def _alu(rng, n):
    """n random computation instructions over r1..r9 (r9 = guarded
    divisor scratch)."""
    out = []
    for _ in range(n):
        pick = rng.random()
        rd = int(rng.integers(1, 9))
        rs1 = int(rng.integers(0, 10))
        rs2 = int(rng.integers(0, 10))
        if pick < 0.55:
            out.append(I(ALU_OPS[int(rng.integers(len(ALU_OPS)))],
                         rd=rd, rs1=rs1, rs2=rs2))
        elif pick < 0.75:
            out.append(I(IMM_OPS[int(rng.integers(len(IMM_OPS)))], rd=rd,
                         rs1=rs1, imm=int(rng.integers(-(1 << 16), 1 << 16))))
        elif pick < 0.85:
            out.append(I(SHIFT_I_OPS[int(rng.integers(3))], rd=rd,
                         rs1=rs1, imm=int(rng.integers(0, 64))))
        else:
            # guarded division: divisor forced nonzero via ORI ..., 1
            out.append(I(Op.ORI, rd=9, rs1=rs2, imm=1))
            out.append(I(DIV_OPS[int(rng.integers(4))],
                         rd=rd, rs1=rs1, rs2=9))
    return out


def generate_program(seed: int):
    """Deterministic structured random program; always terminates."""
    rng = np.random.default_rng(seed)
    instrs = []
    for r in range(1, 10):
        instrs.append(I(Op.ADDI, rd=r, rs1=0,
                        imm=int(rng.integers(-(1 << 16), 1 << 16))))
    n_inputs = int(rng.integers(0, 6))
    for _ in range(int(rng.integers(8, 16))):
        kind = int(rng.integers(6))
        if kind == 0:
            instrs += _alu(rng, int(rng.integers(3, 9)))
        elif kind == 1:
            # forward conditional branch over a random body
            body = _alu(rng, int(rng.integers(1, 5)))
            op = BRANCH_OPS[int(rng.integers(len(BRANCH_OPS)))]
            instrs.append(I(op, rs1=int(rng.integers(0, 10)),
                            rs2=int(rng.integers(0, 10)),
                            imm=4 * (len(body) + 1)))
            instrs += body
        elif kind == 2:
            # forward JAL over a body; link register exercises rd=pc+4
            body = _alu(rng, int(rng.integers(1, 4)))
            instrs.append(I(Op.JAL, rd=int(rng.integers(0, 9)),
                            imm=4 * (len(body) + 1)))
            instrs += body
        elif kind == 3:
            # bounded counted loop (r14 = counter)
            iters = int(rng.integers(1, 9))
            body = _alu(rng, int(rng.integers(1, 4)))
            instrs.append(I(Op.ADDI, rd=14, rs1=0, imm=iters))
            instrs += body
            instrs.append(I(Op.ADDI, rd=14, rs1=14, imm=-1))
            instrs.append(I(Op.BNE, rs1=14, rs2=0,
                            imm=-4 * (len(body) + 1)))
        elif kind == 4:
            # memory: store then load at a scratch slot, random widths
            instrs.append(I(Op.ADDI, rd=15, rs1=0, imm=0x6000))
            offset = int(rng.integers(0, 32)) * 8
            instrs.append(I(STORE_OPS[int(rng.integers(4))], rs1=15,
                            rs2=int(rng.integers(0, 10)), imm=offset))
            instrs.append(I(LOAD_OPS[int(rng.integers(6))],
                            rd=int(rng.integers(1, 9)), rs1=15, imm=offset))
        else:
            # I/O: READ into r10, write r11 back out
            instrs.append(I(Op.ADDI, rd=10, rs1=0, imm=1))   # READ
            instrs.append(I(Op.ECALL))
            instrs.append(I(Op.ADDI, rd=11, rs1=10, imm=0))
            instrs.append(I(Op.ADDI, rd=10, rs1=0, imm=2))   # WRITE
            instrs.append(I(Op.ECALL))
    instrs += [I(Op.ADDI, rd=10, rs1=0, imm=0),
               I(Op.ADDI, rd=11, rs1=1, imm=0),  # exit code = r1 & ...
               I(Op.ANDI, rd=11, rs1=11, imm=0xFF),
               I(Op.ADDI, rd=10, rs1=0, imm=0),
               I(Op.ECALL)]
    inputs = [int(v) for v in rng.integers(0, 1 << 32, size=n_inputs)]
    return Program.from_instructions(instrs), inputs


def oracle_digest(program, inputs):
    """sha256 over (cycles, halt, exit code, outputs, final regs)."""
    vm = VM(program, list(inputs), VMConfig(max_cycles=200_000))
    res = vm.run()
    h = hashlib.sha256()
    h.update(str(res.cycles).encode())
    h.update(res.halt_reason.reason.value.encode())
    h.update(str(res.halt_reason.code).encode())
    h.update(",".join(map(str, res.outputs)).encode())
    h.update(",".join(map(str, vm.state.regs)).encode())
    return h.hexdigest(), res, vm


ALL_SEEDS = list(range(64))


@pytest.fixture(scope="module")
def corpus():
    with open(CORPUS) as f:
        return {int(k): v for k, v in json.load(f).items()}


class TestCorpusPinned:
    """The oracle's behavior on every corpus seed is pinned by digest."""

    @pytest.mark.parametrize("seed", ALL_SEEDS)
    def test_oracle_matches_corpus(self, corpus, seed):
        program, inputs = generate_program(seed)
        digest, _, _ = oracle_digest(program, inputs)
        assert digest == corpus[seed], f"seed {seed} behavior changed"


class TestNativeDifferential:
    """Native C++ VM vs oracle on every corpus seed."""

    @pytest.mark.parametrize("seed", ALL_SEEDS)
    def test_native_agrees(self, seed):
        if not native_vm.available():
            pytest.skip("native VM not built")
        program, inputs = generate_program(seed)
        _, res, vm = oracle_digest(program, inputs)
        nat = native_vm.run_native(program, list(inputs),
                                   max_cycles=200_000)
        assert nat.cycles == res.cycles
        assert nat.outputs == res.outputs
        assert nat.regs == vm.state.regs
        assert nat.halt == 2 and res.halt_reason.reason is HaltReason.EXIT
        assert nat.exit_code == res.halt_reason.code


class TestTpuDifferential:
    """Batched TPU interpreter vs oracle.  All seeds share one
    InterpConfig so the jitted chunk function compiles once; each seed's
    program is just new data for the same kernel."""

    @pytest.mark.parametrize("seed", [0, 7, 13, 21, 42, 63])
    def test_tpu_agrees(self, seed):
        program, inputs = generate_program(seed)
        _, res, vm = oracle_digest(program, inputs)
        interp = TpuInterpreter(program, InterpConfig(lanes=1, chunk=128))
        device = interp.run([list(inputs)], max_cycles=200_000)
        assert int(device["cycles"][0]) == res.cycles
        assert [int(x) for x in device["outputs"][0]] == res.outputs
        for r in range(16):
            assert int(device["regs"][0, r]) == vm.state.regs[r], f"r{r}"
        assert int(device["exit_code"][0]) == res.halt_reason.code


def _regenerate():
    corpus = {}
    for seed in ALL_SEEDS:
        program, inputs = generate_program(seed)
        corpus[seed], _, _ = oracle_digest(program, inputs)
    CORPUS.write_text(json.dumps(corpus, indent=1) + "\n")
    print(f"wrote {CORPUS} ({len(corpus)} seeds)")


if __name__ == "__main__":
    _regenerate()
