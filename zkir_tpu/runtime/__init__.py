"""Scalar oracle VM with full witness generation.

Parity target: the reference ``zkir-runtime`` crate — identical observable
semantics: register/PC evolution, cycle counts, memory op log, trace rows
(pre-instruction state), range-check witnesses, deferred-carry model with
normalization witnesses, syscalls and crypto digests.

This VM is the *differential-test oracle* for the batched TPU interpreter in
``zkir_tpu.interp``: every TPU execution is checked bit-exactly against it.
"""

from .errors import RuntimeError_, DivisionByZero, InvalidSyscall, MisalignedAccess
from .memory import Memory, MemoryOp, MemOpType, MemoryRegion
from .state import VMState, HaltReason, RegState
from .deferred import DeferredConfig
from .range_check import RangeCheckTracker, RangeCheckWitness, RangeLookupTable
from .syscall import (
    IOHandler,
    SYSCALL_EXIT,
    SYSCALL_READ,
    SYSCALL_WRITE,
    SYSCALL_SHA256,
    SYSCALL_POSEIDON2,
    SYSCALL_KECCAK256,
    SYSCALL_BLAKE3,
)
from .vm import VM, VMConfig, ExecutionResult, TraceRow, run
from .normalize import NormalizationResult
from .witness import NormalizationWitness, NormalizationEvent, NormalizationCause
