"""Batched, branch-free columnar interpreter for ZK-IR v3.4.

TPU-first re-architecture of the reference scalar VM loop
(``zkir-runtime/src/vm.rs:208-348``, ``execute.rs:35-673``):

- **state as arrays**: pc/regs/bounds/flags are device arrays with a leading
  lane axis; many program instances execute in lockstep.
- **branch-free dispatch**: one step function computes every instruction
  family's result and selects by opcode with ``jnp.where`` — no
  data-dependent Python control flow, so the whole step jits into a single
  XLA computation.
- **``lax.scan`` over cycles**: trace columns (pre-state registers, memory
  ops, normalization witnesses) are scan outputs, written directly to HBM.
- **halt masking**: halted lanes keep their state; the host driver runs the
  scan in chunks and stops early once every lane has halted (the standard
  static-shape answer to data-dependent cycle counts).
- **host-mediated crypto**: crypto syscalls (SHA-256 / Poseidon2 / Keccak /
  Blake3) pause the lane; between chunks the host services them against the
  lane's memory image using the same primitives as the oracle, then resumes.
  (Dedicated batched device kernels live in ``zkir_tpu.ops``.)

Memory is a flat per-lane byte array covering two windows of the 40-bit
address space (low: code+data+heap from 0; high: the stack region below
``STACK_TOP``), replacing the reference's paged hashmap
(``memory.rs:86-110``); accesses outside the windows set a per-lane error
flag.  The memory-op *log* — the object actually proven — is emitted as
trace columns in the same (timestamp, address, read<write) order as the
reference (``trace.rs:210-223``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.memlayout import CODE_BASE, STACK_TOP
from ..spec.opcodes import Op
from ..spec.program import Program

# Halt codes (per lane).
HALT_NONE = 0
HALT_EBREAK = 1
HALT_EXIT = 2
HALT_CYCLE_LIMIT = 3
HALT_ERROR = 4        # invalid opcode / syscall / memory fault / div0
PAUSE_CRYPTO = 5      # lane waiting for host-serviced crypto syscall

_M40 = (1 << 40) - 1
_M64 = (1 << 64) - 1
_SIGN40 = 1 << 39

u64 = jnp.uint64
i64 = jnp.int64
u32 = jnp.uint32
i32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class InterpConfig:
    """Static interpreter configuration (baked into the jitted step)."""

    lanes: int = 1
    low_bytes: int = 1 << 20       # low window: [0, low_bytes)
    stack_bytes: int = 1 << 16     # high window: (STACK_TOP - stack_bytes, STACK_TOP]
    max_inputs: int = 64
    max_outputs: int = 64
    chunk: int = 256               # cycles per jitted scan
    enable_memory: bool = True     # auto-cleared when the program has no
                                   # loads/stores/crypto (static analysis)
    collect_trace: bool = False
    deferred: bool = False
    normalized_bits: int = 20
    limb_bits: int = 30


class MachineState(NamedTuple):
    """Per-lane machine state carried through the scan."""

    pc: jax.Array            # u64 [L]
    regs: jax.Array          # u64 [L, 16]
    bound_bits: jax.Array    # i32 [L, 16] (ValueBound.max_bits column)
    accum: jax.Array         # i32 [L, 16] (1 = accumulated, deferred model)
    halted: jax.Array        # i32 [L]
    exit_code: jax.Array     # u64 [L]
    cycles: jax.Array        # i64 [L]
    mem: jax.Array           # u8  [L, low_bytes + stack_bytes]
    inputs: jax.Array        # u64 [L, max_inputs]
    n_inputs: jax.Array      # i32 [L]
    input_pos: jax.Array     # i32 [L]
    outputs: jax.Array       # u64 [L, max_outputs]
    out_pos: jax.Array       # i32 [L]


def _sext(value, bits: int):
    """Sign-extend an unsigned field (u64 array) from `bits` to 64 bits."""
    sign = 1 << (bits - 1)
    return (value ^ u64(sign)) - u64(sign)


def _const_bits(v):
    """bit_length of a u64 array (0 for 0)."""
    return (64 - jax.lax.clz(v.astype(jnp.uint64))).astype(i32)


def _mulhi_u64(a, b):
    """High 64 bits of the 128-bit product of two u64 arrays."""
    mask = u64(0xFFFFFFFF)
    al, ah = a & mask, a >> 32
    bl, bh = b & mask, b >> 32
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 32) + (lh & mask) + (hl & mask)
    return hh + (lh >> 32) + (hl >> 32) + (mid >> 32)


def _gather_reg(regs, idx):
    """regs: [L, 16], idx: [L] -> [L]."""
    return jnp.take_along_axis(regs, idx[:, None].astype(i32), axis=1)[:, 0]


def _put_along(arr, idx, value):
    return jax.vmap(lambda row, j, v: row.at[j].set(v))(
        arr, idx.astype(i32), value
    )


class TpuInterpreter:
    """Compile-once batched interpreter for a fixed program shape."""

    def __init__(self, program: Program, config: Optional[InterpConfig] = None):
        self.program = program
        self.config = config or InterpConfig()
        code = np.asarray(program.code, dtype=np.uint32)
        self.n_words = max(len(program.code), 1)
        # Pad the code buffer to a power-of-two bucket so differently-sized
        # programs with the same config share one compiled executable.
        bucket = 64
        while bucket < self.n_words:
            bucket *= 2
        padded = np.zeros(bucket, dtype=np.uint32)
        padded[: code.size] = code
        self.code = jnp.asarray(padded)
        # Static program analysis: if no instruction can touch data memory
        # (no loads/stores, no crypto syscalls possible), compile the step
        # without the gather/scatter machinery.  (Device fetch always reads
        # the immutable code buffer, so self-modifying code is out of scope
        # for the TPU engine either way.)
        ops = code & 0x7F
        has_mem = bool(np.any(((ops >= 0x30) & (ops <= 0x3B))
                              | (ops == 0x50)))
        if not has_mem and self.config.enable_memory:
            self.config = dataclasses.replace(self.config,
                                              enable_memory=False)
        self._chunk_fn = _chunk_fn_for(self.config, bucket)

    # ------------------------------------------------------------------
    # State construction
    # ------------------------------------------------------------------

    def init_state(self, inputs_per_lane: List[List[int]]) -> MachineState:
        cfg = self.config
        L = cfg.lanes
        assert len(inputs_per_lane) == L

        mem = np.zeros((L, cfg.low_bytes + cfg.stack_bytes), dtype=np.uint8)
        # Load code at CODE_BASE, data right after (vm.rs:153-170).
        code_bytes = np.frombuffer(
            np.asarray(self.program.code, dtype="<u4").tobytes(), dtype=np.uint8
        )
        end = CODE_BASE + len(code_bytes)
        if end > cfg.low_bytes:
            raise ValueError("program too large for low memory window")
        mem[:, CODE_BASE:end] = code_bytes
        if self.program.data:
            data = np.frombuffer(bytes(self.program.data), dtype=np.uint8)
            dend = end + len(data)
            if dend > cfg.low_bytes:
                raise ValueError("data too large for low memory window")
            mem[:, end:dend] = data

        inp = np.zeros((L, cfg.max_inputs), dtype=np.uint64)
        n_in = np.zeros(L, dtype=np.int32)
        for lane, vals in enumerate(inputs_per_lane):
            if len(vals) > cfg.max_inputs:
                raise ValueError("too many inputs for tape")
            inp[lane, : len(vals)] = np.asarray(vals, dtype=np.uint64)
            n_in[lane] = len(vals)

        bounds = np.full((L, 16), self.program.config().data_bits, dtype=np.int32)
        bounds[:, 0] = 0

        return MachineState(
            pc=jnp.full(L, self.program.header.entry_point, dtype=u64),
            regs=jnp.zeros((L, 16), dtype=u64),
            bound_bits=jnp.asarray(bounds),
            accum=jnp.zeros((L, 16), dtype=i32),
            halted=jnp.zeros(L, dtype=i32),
            exit_code=jnp.zeros(L, dtype=u64),
            cycles=jnp.zeros(L, dtype=i64),
            mem=jnp.asarray(mem),
            inputs=jnp.asarray(inp),
            n_inputs=jnp.asarray(n_in),
            input_pos=jnp.zeros(L, dtype=i32),
            outputs=jnp.zeros((L, cfg.max_outputs), dtype=u64),
            out_pos=jnp.zeros(L, dtype=i32),
        )

    # ------------------------------------------------------------------
    # The step function
    # ------------------------------------------------------------------

    def _make_chunk_fn(self):
        return functools.partial(
            _chunk_fn_for(self.config, self.code.shape[0]),
            self.code, i32(self.n_words),
        )


    # ------------------------------------------------------------------
    # Host driver
    # ------------------------------------------------------------------

    def run(self, inputs_per_lane: List[List[int]],
            max_cycles: int = 1_000_000) -> Dict[str, Any]:
        """Run all lanes to completion; returns per-lane results and
        (optionally) stacked trace columns."""
        state = self.init_state(inputs_per_lane)
        traces: List[Dict[str, np.ndarray]] = []
        steps_done = 0

        n_words = i32(self.n_words)
        while True:
            state, trace = self._chunk_fn(self.code, n_words, state)
            steps_done += self.config.chunk
            if self.config.collect_trace:
                traces.append(jax.tree.map(np.asarray, trace))

            halted = np.asarray(state.halted)
            if np.any(halted == PAUSE_CRYPTO):
                state = self._service_crypto(state)
                halted = np.asarray(state.halted)
            if np.all(halted != HALT_NONE):
                break
            if steps_done >= max_cycles:
                halted = np.where(halted == HALT_NONE, HALT_CYCLE_LIMIT,
                                  halted)
                state = state._replace(halted=jnp.asarray(halted))
                break

        return self._collect(state, traces)

    def _service_crypto(self, state: MachineState) -> MachineState:
        """Host-side servicing of paused crypto syscalls (one per lane)."""
        from ..runtime import crypto as host_crypto
        from ..runtime.memory import Memory as HostMemory

        cfg = self.config
        halted = np.array(state.halted)
        regs = np.array(state.regs)
        mem = np.array(state.mem)
        pc = np.array(state.pc)
        cycles = np.array(state.cycles)
        bounds = np.array(state.bound_bits)
        stack_lo = STACK_TOP - cfg.stack_bytes + 1

        for lane in np.nonzero(halted == PAUSE_CRYPTO)[0]:
            num = int(regs[lane, 10])
            in_ptr = int(regs[lane, 11])
            in_len = int(regs[lane, 12])
            out_ptr = int(regs[lane, 13])

            host_mem = HostMemory()
            host_mem.set_strict_protection(False)

            def off(addr: int) -> int:
                if addr < cfg.low_bytes:
                    return addr
                if stack_lo <= addr <= STACK_TOP:
                    return cfg.low_bytes + (addr - stack_lo)
                raise ValueError(f"crypto access outside window: {addr:#x}")

            for i in range(in_len):
                host_mem.write_u8(i, int(mem[lane, off(in_ptr + i)]))

            fn = {
                3: host_crypto.sha256_hash,
                4: host_crypto.poseidon2_hash,
                5: host_crypto.keccak256_hash,
                6: host_crypto.blake3_hash,
            }[num]
            fn(host_mem, 0, in_len, 0x10000)
            for i in range(32):
                mem[lane, off(out_ptr + i)] = host_mem._peek(0x10000 + i)

            regs[lane, 10] = 0
            if num == 3:  # SHA-256 writes output bound to R14 (syscall.rs:135)
                bounds[lane, 14] = 32
            pc[lane] += 4
            cycles[lane] += 1
            halted[lane] = HALT_NONE

        return state._replace(
            halted=jnp.asarray(halted), regs=jnp.asarray(regs),
            mem=jnp.asarray(mem), pc=jnp.asarray(pc),
            cycles=jnp.asarray(cycles), bound_bits=jnp.asarray(bounds),
        )

    def _collect(self, state: MachineState,
                 traces: List[Dict[str, np.ndarray]]) -> Dict[str, Any]:
        halted = np.asarray(state.halted)
        out_pos = np.asarray(state.out_pos)
        outputs = np.asarray(state.outputs)
        result: Dict[str, Any] = {
            "halted": halted,
            "exit_code": np.asarray(state.exit_code),
            "cycles": np.asarray(state.cycles),
            "regs": np.asarray(state.regs),
            "bound_bits": np.asarray(state.bound_bits),
            "outputs": [
                list(outputs[lane, : out_pos[lane]])
                for lane in range(self.config.lanes)
            ],
        }
        if traces:
            stacked = {
                key: np.concatenate([t[key] for t in traces], axis=0)
                for key in traces[0]
            }
            result["trace"] = stacked
        return result


def _mem_offset(cfg: InterpConfig, addr):
    """Map a 64-bit address into the flat window buffer.

    Returns (offset u64, in_window bool)."""
    stack_lo = STACK_TOP - cfg.stack_bytes + 1
    in_low = addr < u64(cfg.low_bytes)
    in_stack = (addr >= u64(stack_lo)) & (addr <= u64(STACK_TOP))
    off = jnp.where(
        in_low, addr,
        jnp.where(in_stack, addr - u64(stack_lo) + u64(cfg.low_bytes),
                  u64(0)),
    )
    return off, in_low | in_stack


@functools.lru_cache(maxsize=None)
def _chunk_fn_for(cfg: InterpConfig, code_bucket: int):
    """Build (and cache) the jitted chunk executor for a static config and
    code-buffer bucket size.  The returned function has signature
    ``(code u32[bucket], n_words i32, state) -> (state, trace)``."""
    deferred = cfg.deferred
    nb, lb = cfg.normalized_bits, cfg.limb_bits

    def build(code, n_words, state0):

        def normalize_packed(value, is_accum):
            """Carry-extract a packed register value; returns
            (new_packed_20bit, acc_l0, acc_l1, n0, n1, c0, c1)."""
            bits = jnp.where(is_accum, i32(lb), i32(nb))
            mask = (u64(1) << bits.astype(u64)) - u64(1)
            l0 = value & mask
            l1 = (value >> bits.astype(u64)) & mask
            nmask = u64((1 << nb) - 1)
            c0 = l0 >> u64(nb)
            n0 = l0 & nmask
            l1c = l1 + c0
            c1 = l1c >> u64(nb)
            n1 = l1c & nmask
            packed = n0 | (n1 << u64(nb))
            return packed, l0, l1, n0, n1, c0, c1

        def read_limbs_ext(value, is_accum):
            bits = jnp.where(is_accum, i32(lb), i32(nb))
            mask = (u64(1) << bits.astype(u64)) - u64(1)
            return value & mask, (value >> bits.astype(u64)) & mask

        def step(state: MachineState, _):
            L = cfg.lanes
            active = state.halted == HALT_NONE

            # ---- fetch & decode ----
            pc = state.pc
            in_code = (pc >= u64(CODE_BASE)) \
                & (pc < u64(CODE_BASE) + u64(4) * n_words.astype(u64)) \
                & (pc % u64(4) == 0)
            word_idx = jnp.where(
                in_code, (pc - u64(CODE_BASE)) >> u64(2), u64(0)
            ).astype(i32)
            word = code[jnp.clip(word_idx, 0, code_bucket - 1)]
            word64 = word.astype(u64)

            op = (word & 0x7F).astype(i32)
            f_rd = ((word >> 7) & 0xF).astype(i32)
            f_rs1 = ((word >> 11) & 0xF).astype(i32)
            f_rs2 = ((word >> 15) & 0xF).astype(i32)
            imm17 = _sext((word64 >> u64(15)) & u64(0x1FFFF), 17)
            imm21 = _sext((word64 >> u64(11)) & u64(0x1FFFFF), 21)
            shamt8 = ((word >> 15) & 0xFF).astype(u64)

            is_store = (op >= 0x38) & (op <= 0x3B)
            is_branch = (op >= 0x40) & (op <= 0x45)
            is_load = (op >= 0x30) & (op <= 0x35)
            sb_type = is_store | is_branch
            is_arith = (op >= 0x00) & (op <= 0x08)
            is_logical = (op >= 0x10) & (op <= 0x15)
            is_shift = (op >= 0x18) & (op <= 0x1D)
            is_imm_shift = (op >= 0x1B) & (op <= 0x1D)
            is_compare = (op >= 0x20) & (op <= 0x25)
            is_cmov = (op >= 0x26) & (op <= 0x28)
            is_jump = (op >= 0x48) & (op <= 0x49)
            is_system = (op >= 0x50) & (op <= 0x51)
            valid_op = (
                is_arith | is_logical | is_shift | is_compare | is_cmov
                | is_load | is_store | is_branch | is_jump | is_system
            )

            rs1_idx = jnp.where(sb_type, f_rd, f_rs1)
            rs2_idx = jnp.where(sb_type, f_rs1, f_rs2)
            rd_idx = jnp.where(sb_type, 0, f_rd)

            regs = state.regs
            accum = state.accum
            bound = state.bound_bits

            # ---- capture pre-state for trace ----
            pre_regs = regs
            pre_accum = accum
            pre_bound = bound

            # ---- deferred model: observation-point pre-normalization ----
            norm_w_valid = jnp.zeros(L, dtype=jnp.bool_)
            norm_w = (jnp.zeros(L, dtype=i32),) + tuple(
                jnp.zeros(L, dtype=u64) for _ in range(6)
            )
            if deferred:
                # norm-two ops: branches, stores SB/SH/SW, bitwise R, shift R,
                # mul/div family, comparisons (execute.rs:934-978).
                is_norm_two = (
                    is_branch
                    | ((op >= 0x38) & (op <= 0x3A))   # SB/SH/SW (not SD)
                    | ((op >= 0x10) & (op <= 0x12))   # AND/OR/XOR
                    | ((op >= 0x18) & (op <= 0x1A))   # SLL/SRL/SRA
                    | ((op >= 0x02) & (op <= 0x07))   # MUL..REM
                    | is_compare
                )
                is_norm_one = ((op >= 0x13) & (op <= 0x15)) | is_imm_shift
                do1 = active & (is_norm_two | is_norm_one) & (rs1_idx != 0)
                v1 = _gather_reg(regs, rs1_idx)
                acc1 = _gather_reg(accum, rs1_idx) == 1
                packed1, l0, l1, n0, n1, c0, c1 = normalize_packed(v1, acc1)
                regs = _put_along(
                    regs, rs1_idx, jnp.where(do1, packed1, v1))
                accum = _put_along(
                    accum, rs1_idx,
                    jnp.where(do1, i32(0), _gather_reg(accum, rs1_idx)))
                norm_w_valid = do1
                norm_w = (rs1_idx, l0, l1, n0, n1, c0, c1)

                # rs2: silent normalization only if accumulated.
                do2 = active & is_norm_two & (rs2_idx != 0)
                v2 = _gather_reg(regs, rs2_idx)
                acc2 = _gather_reg(accum, rs2_idx) == 1
                do2 = do2 & acc2
                packed2, *_ = normalize_packed(v2, acc2)
                regs = _put_along(regs, rs2_idx, jnp.where(do2, packed2, v2))
                accum = _put_along(
                    accum, rs2_idx,
                    jnp.where(do2, i32(0), _gather_reg(accum, rs2_idx)))

            # ---- operand reads (post-normalization) ----
            a_raw = _gather_reg(regs, rs1_idx)
            b_raw = _gather_reg(regs, rs2_idx)
            rd_old = _gather_reg(regs, rd_idx)
            a_bound = _gather_reg(bound, rs1_idx)
            b_bound = _gather_reg(bound, rs2_idx)
            rd_bound_old = _gather_reg(bound, rd_idx)

            a40 = a_raw & u64(_M40)
            b40 = b_raw & u64(_M40)
            imm_u = imm17  # sign-extended through u64
            imm40 = imm_u & u64(_M40)
            imm_bits = _const_bits(imm_u)

            # ---- arithmetic ----
            add_r = (a40 + b40) & u64(_M40)
            sub_r = (a40 - b40) & u64(_M40)
            mul_r = (a40 * b40) & u64(_M40)
            addi_r = (a40 + imm40) & u64(_M40)
            lo_prod = a_raw * b_raw
            hi_prod = _mulhi_u64(a_raw, b_raw)
            mulh_r = ((hi_prod << u64(24)) | (lo_prod >> u64(40))) & u64(_M40)

            b_zero = b_raw == 0
            safe_b = jnp.where(b_zero, u64(1), b_raw)
            divu_r = a_raw // safe_b
            remu_r = a_raw % safe_b
            ai = a_raw.astype(i64)
            bi = safe_b.astype(i64)
            div_r = jax.lax.div(ai, bi).astype(u64)
            rem_r = jax.lax.rem(ai, bi).astype(u64)
            is_divrem = (op >= 0x04) & (op <= 0x07)
            div0_err = is_divrem & b_zero

            arith_r = jnp.select(
                [op == Op.ADD, op == Op.SUB, op == Op.MUL, op == Op.MULH,
                 op == Op.DIVU, op == Op.REMU, op == Op.DIV, op == Op.REM,
                 op == Op.ADDI],
                [add_r, sub_r, mul_r, mulh_r, divu_r, remu_r, div_r, rem_r,
                 addi_r],
                u64(0),
            )

            # ---- logical ----
            log_b = jnp.where(op >= 0x13, imm40, b40)
            logical_r = jnp.select(
                [(op == Op.AND) | (op == Op.ANDI),
                 (op == Op.OR) | (op == Op.ORI),
                 (op == Op.XOR) | (op == Op.XORI)],
                [a40 & log_b, a40 | log_b, a40 ^ log_b],
                u64(0),
            )

            # ---- shifts ----
            shamt = jnp.where(is_imm_shift, shamt8, b_raw & u64(0x3F))
            shc = jnp.minimum(shamt, u64(63))
            big = shamt >= u64(40)
            sll_r = jnp.where(big, u64(0), (a40 << shc) & u64(_M40))
            srl_r = jnp.where(big, u64(0), a40 >> shc)
            neg = (a40 >> u64(39)) & u64(1)
            fill = u64(_M40) ^ (u64(_M40) >> jnp.minimum(shamt, u64(40)))
            sra_in = jnp.where(big, jnp.where(neg == 1, u64(_M40), u64(0)),
                               jnp.where(neg == 1, srl_r | fill, srl_r))
            is_sll = (op == Op.SLL) | (op == Op.SLLI)
            is_srl = (op == Op.SRL) | (op == Op.SRLI)
            shift_r = jnp.select(
                [is_sll, is_srl], [sll_r, srl_r], sra_in
            )

            # ---- compares ----
            slt_p = (a40 ^ u64(_SIGN40)) < (b40 ^ u64(_SIGN40))
            sltu_p = a40 < b40
            eq_raw = a_raw == b_raw
            cmp_r = jnp.select(
                [op == Op.SLTU, op == Op.SGEU, op == Op.SLT, op == Op.SGE,
                 op == Op.SEQ, op == Op.SNE],
                [sltu_p, ~sltu_p, slt_p, ~slt_p, eq_raw, ~eq_raw],
                False,
            ).astype(u64)

            # ---- cmov ----
            cmov_cond = jnp.where(op == Op.CMOVZ, b_raw == 0, b_raw != 0)
            cmov_r = jnp.where(cmov_cond, a_raw, rd_old)

            # ---- memory ----
            addr = a_raw + imm_u
            width = jnp.select(
                [(op == Op.LB) | (op == Op.LBU) | (op == Op.SB),
                 (op == Op.LH) | (op == Op.LHU) | (op == Op.SH),
                 (op == Op.LW) | (op == Op.SW),
                 (op == Op.LD) | (op == Op.SD)],
                [i32(1), i32(2), i32(4), i32(8)],
                i32(0),
            )
            is_mem = is_load | is_store
            if cfg.enable_memory:
                aligned = jnp.where(
                    width > 0, addr % width.astype(u64) == 0, True)
                off, in_window = _mem_offset(cfg, addr)
                mem_err = is_mem & active & (~in_window | ~aligned)

                byte_idx = (off[:, None]
                            + jnp.arange(8, dtype=u64)[None, :])
                byte_idx = jnp.minimum(
                    byte_idx, u64(cfg.low_bytes + cfg.stack_bytes - 1)
                ).astype(i32)
                cur_bytes = jnp.take_along_axis(state.mem, byte_idx, axis=1)

                shifts = (jnp.arange(8, dtype=np.uint32) * 8).astype(u64)
                byte_in_width = jnp.arange(8, dtype=np.int32)[None, :] \
                    < width[:, None]
                loaded = jnp.sum(
                    jnp.where(byte_in_width,
                              cur_bytes.astype(u64) << shifts[None, :],
                              u64(0)),
                    axis=1,
                )
            else:
                # Program statically cannot touch memory.
                mem_err = is_mem & active  # decoded garbage would fault
                loaded = jnp.zeros_like(addr)
            # sign extension for LB/LH (through full 64 bits, execute.rs:477-510)
            lb_v = jnp.where((loaded & u64(0x80)) != 0,
                             loaded | u64(_M64 ^ 0xFF), loaded)
            lh_v = jnp.where((loaded & u64(0x8000)) != 0,
                             loaded | u64(_M64 ^ 0xFFFF), loaded)
            load_r = jnp.select(
                [op == Op.LB, op == Op.LH],
                [lb_v, lh_v],
                loaded,
            )
            load_bound = jnp.select(
                [(op == Op.LB) | (op == Op.LBU),
                 (op == Op.LH) | (op == Op.LHU),
                 op == Op.LW],
                [i32(8), i32(16), i32(32)],
                i32(40),
            )

            # ---- branches / jumps ----
            br_taken = jnp.select(
                [op == Op.BEQ, op == Op.BNE, op == Op.BLT, op == Op.BGE,
                 op == Op.BLTU, op == Op.BGEU],
                [eq_raw, ~eq_raw, slt_p, ~slt_p, sltu_p, ~sltu_p],
                False,
            )
            link = pc + u64(4)
            jalr_target = (a_raw + imm_u) & ~u64(1)

            # ---- syscalls ----
            num = regs[:, 10]
            is_ecall = op == Op.ECALL
            sys_exit = is_ecall & (num == 0)
            sys_read = is_ecall & (num == 1)
            sys_write = is_ecall & (num == 2)
            sys_crypto = is_ecall & (num >= 3) & (num <= 6)
            sys_invalid = is_ecall & (num > 6)

            # ---- fault / pause / commit resolution ----
            err = active & (
                ~in_code | ~valid_op | div0_err | mem_err | sys_invalid
            )
            pause = active & sys_crypto & ~err
            commit = active & ~pause & ~err

            # ---- memory store (gated on commit) ----
            store_val = b_raw
            if cfg.enable_memory:
                store_bytes = (store_val[:, None]
                               >> shifts[None, :]).astype(jnp.uint8)
                do_store = (commit & is_store)[:, None] & byte_in_width
                new_bytes = jnp.where(do_store, store_bytes, cur_bytes)
                mem = jax.vmap(lambda row, j, v: row.at[j].set(v))(
                    state.mem, byte_idx, new_bytes
                )
            else:
                mem = state.mem

            # ---- I/O tape effects (gated on commit) ----
            read_val = jnp.where(
                state.input_pos < state.n_inputs,
                jnp.take_along_axis(
                    state.inputs,
                    jnp.minimum(state.input_pos, cfg.max_inputs - 1)[:, None],
                    axis=1,
                )[:, 0],
                u64(0),
            )
            input_pos = state.input_pos + (commit & sys_read).astype(i32)

            out_slot = jnp.minimum(state.out_pos, cfg.max_outputs - 1)
            do_write_out = commit & sys_write
            outputs = jax.vmap(lambda row, j, v, en: row.at[j].set(
                jnp.where(en, v, row[j])))(
                state.outputs, out_slot, regs[:, 11], do_write_out
            )
            out_pos = state.out_pos + do_write_out.astype(i32)

            # ---- rd writeback selection ----
            writes_rd = (
                is_arith | is_logical | is_shift | is_compare | is_cmov
                | is_load | (op == Op.JAL) | (op == Op.JALR)
            )
            result = jnp.select(
                [is_arith, is_logical, is_shift, is_compare, is_cmov,
                 is_load, is_jump],
                [arith_r, logical_r, shift_r, cmp_r, cmov_r, load_r, link],
                u64(0),
            )

            # cmov only writes when its condition holds (execute.rs:434-474
            # writes nothing otherwise — bound also unchanged).
            cmov_effective = ~is_cmov | cmov_cond

            # ---- deferred ADD/SUB/ADDI override ----
            if deferred:
                is_def = (op == Op.ADD) | (op == Op.SUB) | (op == Op.ADDI)
                al0, al1 = read_limbs_ext(
                    a_raw, _gather_reg(accum, rs1_idx) == 1)
                bl0, bl1 = read_limbs_ext(
                    b_raw, _gather_reg(accum, rs2_idx) == 1)
                nmask = u64((1 << nb) - 1)
                il0, il1 = imm_u & nmask, (imm_u >> u64(nb)) & nmask
                o0 = jnp.where(op == Op.ADDI, il0, bl0)
                o1 = jnp.where(op == Op.ADDI, il1, bl1)
                d0 = jnp.where(op == Op.SUB, al0 - o0, al0 + o0)
                d1 = jnp.where(op == Op.SUB, al1 - o1, al1 + o1)
                limit = u64(1 << lb)
                overflow = ((op != Op.SUB) & ((d0 >= limit) | (d1 >= limit)))
                # Overflow path: normalize sources, recompute (deferred.rs:100-119).
                pa, *_ = normalize_packed(
                    a_raw, _gather_reg(accum, rs1_idx) == 1)
                pb, *_ = normalize_packed(
                    b_raw, _gather_reg(accum, rs2_idx) == 1)
                na0, na1 = pa & nmask, (pa >> u64(nb)) & nmask
                nb0, nb1 = pb & nmask, (pb >> u64(nb)) & nmask
                no0 = jnp.where(op == Op.ADDI, il0, nb0)
                no1 = jnp.where(op == Op.ADDI, il1, nb1)
                nd0 = na0 + no0
                nd1 = na1 + no1
                d0 = jnp.where(overflow, nd0, d0)
                d1 = jnp.where(overflow, nd1, d1)
                # Write back normalized sources when overflow forced it.
                ovf_on = active & is_def & overflow
                regs = _put_along(regs, rs1_idx,
                                  jnp.where(ovf_on & (rs1_idx != 0), pa, a_raw))
                accum = _put_along(
                    accum, rs1_idx,
                    jnp.where(ovf_on & (rs1_idx != 0), i32(0),
                              _gather_reg(accum, rs1_idx)))
                is_addi = op == Op.ADDI
                regs = _put_along(
                    regs, rs2_idx,
                    jnp.where(ovf_on & ~is_addi & (rs2_idx != 0), pb,
                              _gather_reg(regs, rs2_idx)))
                accum = _put_along(
                    accum, rs2_idx,
                    jnp.where(ovf_on & ~is_addi & (rs2_idx != 0), i32(0),
                              _gather_reg(accum, rs2_idx)))
                # Pack exactly like the reference write_reg_from_accumulated
                # (state.rs:184-192): limb0 is OR'd in UNMASKED, so limbs
                # that exceed limb_bits overlap into limb1's bits.
                def_packed = d0 | (d1 << u64(lb))
                result = jnp.where(is_def, def_packed, result)

            # ---- bound propagation ----
            max_ab = jnp.maximum(a_bound, b_bound)
            ai_bound = jnp.maximum(a_bound, imm_bits)
            sh32 = shamt.astype(i32)
            new_bound = jnp.select(
                [op == Op.ADD, op == Op.ADDI, op == Op.SUB,
                 (op == Op.MUL) | (op == Op.MULH),
                 is_divrem,
                 (op == Op.AND), (op == Op.ANDI),
                 (op == Op.OR) | (op == Op.XOR),
                 (op == Op.ORI) | (op == Op.XORI),
                 is_sll, is_srl,
                 (op == Op.SRA) | (op == Op.SRAI),
                 is_compare,
                 is_cmov,
                 is_load,
                 is_jump],
                [max_ab + 1, ai_bound + 1, max_ab,
                 a_bound + b_bound,
                 a_bound,
                 jnp.minimum(a_bound, b_bound), jnp.minimum(a_bound, imm_bits),
                 max_ab,
                 jnp.maximum(a_bound, imm_bits),
                 jnp.minimum(a_bound + sh32, 40),
                 jnp.maximum(a_bound - sh32, 0),
                 jnp.where(a_bound >= 40, 40, jnp.maximum(a_bound - sh32, 0)),
                 i32(1),
                 jnp.maximum(a_bound, rd_bound_old),
                 load_bound,
                 _const_bits(link)],
                i32(40),
            )

            # ---- assemble new state ----
            wb = commit & writes_rd & cmov_effective & ~is_branch & ~is_store
            regs = _put_along(
                regs, rd_idx,
                jnp.where(wb & (rd_idx != 0), result,
                          _gather_reg(regs, rd_idx)))
            bound = _put_along(
                bound, rd_idx,
                jnp.where(wb & (rd_idx != 0), new_bound,
                          _gather_reg(bound, rd_idx)))
            if deferred:
                # Only deferred writes mark rd Accumulated; plain writes
                # leave the flag untouched (the reference's write_reg never
                # updates register_states — state.rs:87-91).
                is_def_w = (op == Op.ADD) | (op == Op.SUB) | (op == Op.ADDI)
                accum = _put_along(
                    accum, rd_idx,
                    jnp.where(wb & (rd_idx != 0) & is_def_w,
                              i32(1),
                              _gather_reg(accum, rd_idx)))

            # READ syscall writes its value into r10 (syscall.rs:107-112);
            # WRITE leaves registers untouched (syscall.rs:114-119).
            regs = regs.at[:, 10].set(
                jnp.where(commit & sys_read, read_val, regs[:, 10]))

            next_pc = jnp.select(
                [is_branch, op == Op.JAL, op == Op.JALR],
                [pc + jnp.where(br_taken, imm_u, u64(4)), pc + imm21,
                 jalr_target],
                pc + u64(4),
            )
            pc_new = jnp.where(commit, next_pc, pc)

            halted = jnp.where(
                err, i32(HALT_ERROR),
                jnp.where(
                    pause, i32(PAUSE_CRYPTO),
                    jnp.where(
                        commit & (op == Op.EBREAK), i32(HALT_EBREAK),
                        jnp.where(commit & sys_exit, i32(HALT_EXIT),
                                  state.halted))))
            exit_code = jnp.where(commit & sys_exit, regs[:, 11],
                                  state.exit_code)
            cycles = state.cycles + commit.astype(i64)

            # Keep halted lanes frozen.
            frozen = ~commit
            pc_new = jnp.where(frozen, pc, pc_new)

            new_state = MachineState(
                pc=pc_new, regs=regs, bound_bits=bound, accum=accum,
                halted=halted, exit_code=exit_code, cycles=cycles,
                mem=mem, inputs=state.inputs, n_inputs=state.n_inputs,
                input_pos=input_pos, outputs=outputs, out_pos=out_pos,
            )

            if cfg.collect_trace:
                accum_mask = jnp.sum(
                    (pre_accum.astype(u32) << jnp.arange(16, dtype=np.uint32)
                     [None, :]), axis=1, dtype=u32)
                trace = {
                    "valid": commit,
                    "cycle": state.cycles,
                    "pc": pc,
                    "word": word,
                    "regs": pre_regs,
                    "bounds": pre_bound,
                    "accum_mask": accum_mask,
                    "mem_valid": commit & is_mem & (width > 0),
                    "mem_addr": addr,
                    "mem_value": jnp.where(
                        is_store,
                        jnp.where(
                            width == 8, store_val,
                            store_val
                            & ((u64(1) << (u64(8) * jnp.minimum(
                                width, 7).astype(u64))) - u64(1))),
                        loaded),
                    "mem_width": width,
                    "mem_is_write": is_store,
                }
                # Range-check witness columns: the reference defers a check
                # when an ADD/MUL result's bound exceeds the data width
                # (execute.rs:56-60, 92-96) and flushes it at checkpoints
                # with a 4x10-bit chunk decomposition
                # (range_check.rs:140-192).  The device emits the
                # per-deferral witness row directly: (value, chunks, pc).
                rc_value = jnp.where(op == Op.MUL, mul_r, add_r)
                trace["rc_valid"] = (
                    commit & ((op == Op.ADD) | (op == Op.MUL))
                    & (new_bound > 40)
                )
                trace["rc_value"] = rc_value
                trace["rc_chunks"] = jnp.stack(
                    [(rc_value >> u64(10 * c)) & u64(0x3FF)
                     for c in range(4)], axis=1)
                if deferred:
                    trace["norm_valid"] = norm_w_valid
                    (trace["norm_reg"], trace["norm_acc0"], trace["norm_acc1"],
                     trace["norm_n0"], trace["norm_n1"], trace["norm_c0"],
                     trace["norm_c1"]) = norm_w
            else:
                trace = {}

            return new_state, trace

        return jax.lax.scan(step, state0, None, length=cfg.chunk)

    return jax.jit(build)

