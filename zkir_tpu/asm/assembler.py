"""Two-pass assembler: text -> Program.

Parity target: reference ``zkir-assembler/src/assembler.rs`` — identical
grammar: per-mnemonic operand shapes with exact token-count checks
(assembler.rs:236-497), ``.config limb_bits/data_limbs/addr_limbs``
directives (assembler.rs:127-186), ``#`` comments, labels collected at
``pc = CODE_BASE + 4*i`` (assembler.rs:94-124).

Deliberate extension over the reference (whose second pass never uses the
label table — assembler.rs:198-209): branch/jump offset operands may be a
label name, resolved to the *relative byte offset* from the instruction.
Numeric-offset source assembles bit-identically to the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..spec.config import Config, ConfigError
from ..spec.isa import Instruction
from ..spec.memlayout import CODE_BASE
from ..spec.opcodes import Op
from ..spec.program import Program
from ..spec.registers import reg_from_name
from .lexer import LexError, Token, tokenize


class AssemblerError(ValueError):
    def __init__(self, line: int, message: str):
        super().__init__(f"line {line}: {message}")
        self.line = line
        self.message = message


@dataclass
class _PendingInstr:
    """A parsed instruction, possibly with an unresolved label operand."""

    inst: Instruction
    pc: int
    label: Optional[str] = None  # to resolve into inst.imm (relative offset)
    line: int = 0


_R_TYPE = {
    "add": Op.ADD, "sub": Op.SUB, "mul": Op.MUL, "mulh": Op.MULH,
    "div": Op.DIV, "divu": Op.DIVU, "rem": Op.REM, "remu": Op.REMU,
    "and": Op.AND, "or": Op.OR, "xor": Op.XOR,
    "sll": Op.SLL, "srl": Op.SRL, "sra": Op.SRA,
    "slt": Op.SLT, "sltu": Op.SLTU, "sge": Op.SGE, "sgeu": Op.SGEU,
    "seq": Op.SEQ, "sne": Op.SNE,
    "cmov": Op.CMOV, "cmovz": Op.CMOVZ, "cmovnz": Op.CMOVNZ,
}
_I_TYPE = {"addi": Op.ADDI, "xori": Op.XORI, "ori": Op.ORI, "andi": Op.ANDI}
_SHIFT_IMM = {"slli": Op.SLLI, "srli": Op.SRLI, "srai": Op.SRAI}
_LOAD = {"lw": Op.LW, "lh": Op.LH, "lhu": Op.LHU, "lb": Op.LB,
         "lbu": Op.LBU, "ld": Op.LD}
_STORE = {"sw": Op.SW, "sh": Op.SH, "sb": Op.SB, "sd": Op.SD}
_BRANCH = {"beq": Op.BEQ, "bne": Op.BNE, "blt": Op.BLT, "bge": Op.BGE,
           "bltu": Op.BLTU, "bgeu": Op.BGEU}


def assemble(source: str) -> Program:
    """Assemble source text into a Program (reference assembler.rs:43-57)."""
    pending, labels, config = _first_pass(source)
    code = []
    for item in pending:
        inst = item.inst
        if item.label is not None:
            if item.label not in labels:
                raise AssemblerError(item.line, f"undefined label: {item.label}")
            offset = labels[item.label] - item.pc
            inst = Instruction(inst.op, rd=inst.rd, rs1=inst.rs1,
                               rs2=inst.rs2, imm=offset)
        code.append(inst.encode())

    program = Program.with_config(config)
    program.code = code
    program.header.code_size = len(code) * 4
    return program


def _first_pass(source: str) -> Tuple[List[_PendingInstr], Dict[str, int], Config]:
    pending: List[_PendingInstr] = []
    labels: Dict[str, int] = {}
    limb_bits, data_limbs, addr_limbs = 20, 2, 2
    pc = CODE_BASE

    for line_idx, raw_line in enumerate(source.splitlines()):
        line_num = line_idx + 1
        text = raw_line.strip()
        if not text or text.startswith("#"):
            continue
        hash_pos = text.find("#")
        if hash_pos >= 0:
            text = text[:hash_pos].strip()
        if not text:
            continue

        try:
            tokens = tokenize(text)
        except LexError as e:
            raise AssemblerError(line_num, str(e)) from e
        if not tokens:
            continue

        # Label: identifier followed by colon (assembler.rs:94-124)
        if len(tokens) >= 2 and tokens[0].kind == "ident" and tokens[1].kind == "colon":
            name = tokens[0].text
            if not _is_valid_label(name):
                raise AssemblerError(line_num, f"invalid label name: {name}")
            if name in labels:
                raise AssemblerError(line_num, f"duplicate label: {name}")
            labels[name] = pc
            if len(tokens) > 2:
                pending.append(_parse_instruction(tokens[2:], line_num, pc))
                pc += 4
            continue

        # Directive (assembler.rs:127-186)
        if tokens[0].kind == "directive":
            if tokens[0].text == "config":
                if len(tokens) != 3:
                    raise AssemblerError(
                        line_num, ".config requires 2 arguments: key value"
                    )
                if tokens[1].kind != "ident":
                    raise AssemblerError(line_num, "config key must be an identifier")
                key = tokens[1].text
                value = _extract_number(tokens[2], line_num)
                if key == "limb_bits":
                    limb_bits = value
                elif key == "data_limbs":
                    data_limbs = value
                elif key == "addr_limbs":
                    addr_limbs = value
                else:
                    raise AssemblerError(
                        line_num, f"invalid config key: {key} = {value}"
                    )
                try:
                    # Incremental validation after each mutation, matching
                    # the reference (assembler.rs:149-170).
                    Config(limb_bits, data_limbs, addr_limbs)
                except ConfigError as e:
                    raise AssemblerError(line_num, str(e)) from e
            # Other directives (.text, .data, ...) are ignored.
            continue

        pending.append(_parse_instruction(tokens, line_num, pc))
        pc += 4

    return pending, labels, Config(limb_bits, data_limbs, addr_limbs)


def _parse_instruction(tokens: List[Token], line: int, pc: int) -> _PendingInstr:
    if not tokens:
        raise AssemblerError(line, "empty instruction")
    head = tokens[0]
    if head.kind != "ident":
        raise AssemblerError(line, f"expected instruction mnemonic, got {head.text!r}")
    mnemonic = head.text.lower()
    operands = tokens[1:]

    if mnemonic == "ecall":
        _expect_no_operands(operands, line)
        return _PendingInstr(Instruction(Op.ECALL), pc, line=line)
    if mnemonic == "ebreak":
        _expect_no_operands(operands, line)
        return _PendingInstr(Instruction(Op.EBREAK), pc, line=line)

    if mnemonic in _R_TYPE:
        rd, rs1, rs2 = _parse_three_regs(operands, line, "R-type")
        return _PendingInstr(
            Instruction(_R_TYPE[mnemonic], rd=rd, rs1=rs1, rs2=rs2), pc, line=line
        )

    if mnemonic in _I_TYPE:
        rd, rs1, imm = _parse_reg_reg_imm(operands, line, "I-type")
        return _PendingInstr(
            Instruction(_I_TYPE[mnemonic], rd=rd, rs1=rs1, imm=imm), pc, line=line
        )

    if mnemonic in _SHIFT_IMM:
        rd, rs1, shamt = _parse_reg_reg_imm(operands, line, "Shift")
        return _PendingInstr(
            Instruction(_SHIFT_IMM[mnemonic], rd=rd, rs1=rs1, imm=shamt & 0xFF),
            pc, line=line,
        )

    if mnemonic in _LOAD:
        rd, rs1, offset = _parse_mem_operands(operands, line, "Load")
        return _PendingInstr(
            Instruction(_LOAD[mnemonic], rd=rd, rs1=rs1, imm=offset), pc, line=line
        )

    if mnemonic in _STORE:
        rs2, rs1, offset = _parse_mem_operands(operands, line, "Store")
        return _PendingInstr(
            Instruction(_STORE[mnemonic], rs1=rs1, rs2=rs2, imm=offset), pc, line=line
        )

    if mnemonic in _BRANCH:
        if len(operands) != 5:
            raise AssemblerError(line, "Branch requires 3 operands: rs1, rs2, offset")
        rs1 = _extract_register(operands[0], line)
        _expect(operands[1], "comma", line)
        rs2 = _extract_register(operands[2], line)
        _expect(operands[3], "comma", line)
        label = None
        imm = 0
        if operands[4].kind == "ident":
            label = operands[4].text  # label-resolution extension
        else:
            imm = _extract_number(operands[4], line)
        return _PendingInstr(
            Instruction(_BRANCH[mnemonic], rs1=rs1, rs2=rs2, imm=imm),
            pc, label=label, line=line,
        )

    if mnemonic == "jal":
        if len(operands) != 3:
            raise AssemblerError(line, "JAL requires 2 operands: rd, offset")
        rd = _extract_register(operands[0], line)
        _expect(operands[1], "comma", line)
        label = None
        imm = 0
        if operands[2].kind == "ident":
            label = operands[2].text
        else:
            imm = _extract_number(operands[2], line)
        return _PendingInstr(
            Instruction(Op.JAL, rd=rd, imm=imm), pc, label=label, line=line
        )

    if mnemonic == "jalr":
        rd, rs1, imm = _parse_reg_reg_imm(operands, line, "JALR")
        return _PendingInstr(
            Instruction(Op.JALR, rd=rd, rs1=rs1, imm=imm), pc, line=line
        )

    raise AssemblerError(line, f"invalid instruction: {mnemonic}")


# ---- operand shape helpers (assembler.rs:338-497) ----


def _expect_no_operands(operands: List[Token], line: int) -> None:
    if operands:
        raise AssemblerError(line, "Instruction takes no operands")


def _parse_three_regs(operands: List[Token], line: int, what: str):
    if len(operands) != 5:
        raise AssemblerError(line, f"{what} requires 3 operands: rd, rs1, rs2")
    rd = _extract_register(operands[0], line)
    _expect(operands[1], "comma", line)
    rs1 = _extract_register(operands[2], line)
    _expect(operands[3], "comma", line)
    rs2 = _extract_register(operands[4], line)
    return rd, rs1, rs2


def _parse_reg_reg_imm(operands: List[Token], line: int, what: str):
    if len(operands) != 5:
        raise AssemblerError(line, f"{what} requires 3 operands: rd, rs1, imm")
    rd = _extract_register(operands[0], line)
    _expect(operands[1], "comma", line)
    rs1 = _extract_register(operands[2], line)
    _expect(operands[3], "comma", line)
    imm = _extract_number(operands[4], line)
    return rd, rs1, imm


def _parse_mem_operands(operands: List[Token], line: int, what: str):
    """Parse ``reg, offset(base)`` shape; returns (reg, base, offset)."""
    if len(operands) != 6:
        raise AssemblerError(line, f"{what} requires format: reg, offset(base)")
    reg = _extract_register(operands[0], line)
    _expect(operands[1], "comma", line)
    offset = _extract_number(operands[2], line)
    _expect(operands[3], "lparen", line)
    base = _extract_register(operands[4], line)
    _expect(operands[5], "rparen", line)
    return reg, base, offset


def _extract_register(token: Token, line: int) -> int:
    if token.kind != "reg":
        raise AssemblerError(line, f"expected register, got {token.text!r}")
    try:
        return reg_from_name(token.text)
    except KeyError as e:
        raise AssemblerError(line, f"invalid register: {token.text}") from e


def _extract_number(token: Token, line: int) -> int:
    if token.kind != "num":
        raise AssemblerError(line, f"expected number, got {token.text!r}")
    return token.value


def _expect(token: Token, kind: str, line: int) -> None:
    if token.kind != kind:
        want = {"comma": "','", "lparen": "'('", "rparen": "')'"}.get(kind, kind)
        raise AssemblerError(line, f"expected {want}, got {token.text!r}")


def _is_valid_label(label: str) -> bool:
    if not label:
        return False
    first = label[0]
    if not (first.isalpha() or first == "_"):
        return False
    return all(c.isalnum() or c == "_" for c in label)
