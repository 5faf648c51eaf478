"""Core data model for ZK-IR v3.4 (host side).

Mirrors the public surface of the reference ``zkir-spec`` crate
(``zkir-spec/src/lib.rs:28-45``) with idiomatic Python types.
"""

from .config import Config, ConfigError, DEFAULT_CONFIG
from .registers import (
    NUM_REGISTERS,
    REG_ALIASES,
    REG_NAMES,
    reg_from_name,
    reg_name,
)
from .opcodes import (
    Op,
    Family,
    OPCODE_NAMES,
    VALID_OPCODES,
    family_of,
    is_arithmetic,
    is_branch,
    is_cmov,
    is_compare,
    is_jump,
    is_load,
    is_logical,
    is_shift,
    is_store,
    is_system,
    uses_immediate,
)
from .encoding import (
    OPCODE_MASK,
    REGISTER_MASK,
    IMM_MASK,
    FUNCT_MASK,
    OFFSET_MASK,
    extract_opcode,
    extract_rd,
    extract_rs1,
    extract_rs2,
    extract_imm,
    extract_imm_signed,
    extract_funct,
    extract_offset,
    extract_offset_signed,
    encode_rtype,
    encode_itype,
    encode_stype,
    encode_btype,
    encode_jtype,
    sign_extend,
)
from .isa import Instruction
from .field import M31, M31_PRIME, m31_add, m31_sub, m31_mul, m31_neg, m31_inv, m31_pow
from .bounds import (
    BoundSource,
    CryptoType,
    ValueBound,
)
from .program import (
    MAGIC,
    VERSION,
    HEADER_SIZE,
    ProgramHeader,
    Program,
    FormatMode,
    ZkIrError,
)
from .memlayout import (
    RESERVED_BASE,
    RESERVED_SIZE,
    CODE_BASE,
    CODE_SIZE,
    DATA_BASE,
    DATA_SIZE,
    HEAP_BASE,
    STACK_TOP,
    DEFAULT_STACK_SIZE,
    DEFAULT_HEAP_SIZE,
)
from .validation import validate_program, validate_instruction, ValidationError
