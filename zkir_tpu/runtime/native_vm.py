"""ctypes bridge to the native C++ fast interpreter (``native/zkir_vm.cpp``).

Builds the shared library on first use (g++ -O3) and exposes ``run_native``
with the same result shape as the Python oracle's plain execution.  Crypto
syscalls return ``HALT_UNSUPPORTED_SYSCALL`` — programs using them run on
the Python oracle or the TPU interpreter instead.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from dataclasses import dataclass
from typing import List, Optional

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "zkir_vm.cpp"
_LIB = _REPO_ROOT / "native" / "libzkir_vm.so"

HALT_NONE = 0
HALT_EBREAK = 1
HALT_EXIT = 2
HALT_CYCLE_LIMIT = 3
HALT_ERROR = 4
HALT_UNSUPPORTED_SYSCALL = 6

_lib: Optional[ctypes.CDLL] = None


class NativeBuildError(RuntimeError):
    pass


def ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeBuildError(f"failed to build native VM: {detail}")
    lib = ctypes.CDLL(str(_LIB))
    lib.zkir_run.restype = ctypes.c_int
    lib.zkir_run.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,   # code
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,    # data
        ctypes.c_uint64,                                    # entry
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,   # inputs
        ctypes.c_uint64,                                    # max_cycles
        ctypes.POINTER(ctypes.c_uint64),                    # out regs[16]
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,   # outputs
        ctypes.POINTER(ctypes.c_uint64),                    # n_outputs
        ctypes.POINTER(ctypes.c_uint64),                    # cycles
        ctypes.POINTER(ctypes.c_uint64),                    # exit_code
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        ensure_built()
        return True
    except NativeBuildError:
        return False


@dataclass
class NativeResult:
    halt: int
    cycles: int
    exit_code: int
    outputs: List[int]
    regs: List[int]


def run_native(program, inputs: List[int],
               max_cycles: int = 1_000_000,
               max_outputs: int = 4096) -> NativeResult:
    """Execute a Program on the native core."""
    lib = ensure_built()

    code_arr = (ctypes.c_uint32 * max(len(program.code), 1))(
        *[w & 0xFFFFFFFF for w in program.code])
    data_bytes = bytes(program.data)
    data_arr = (ctypes.c_uint8 * max(len(data_bytes), 1))(*data_bytes)
    in_arr = (ctypes.c_uint64 * max(len(inputs), 1))(
        *[v & ((1 << 64) - 1) for v in inputs])
    regs = (ctypes.c_uint64 * 16)()
    outputs = (ctypes.c_uint64 * max_outputs)()
    n_out = ctypes.c_uint64()
    cycles = ctypes.c_uint64()
    exit_code = ctypes.c_uint64()

    halt = lib.zkir_run(
        code_arr, len(program.code),
        data_arr, len(data_bytes),
        program.header.entry_point,
        in_arr, len(inputs),
        max_cycles,
        regs, outputs, max_outputs, ctypes.byref(n_out),
        ctypes.byref(cycles), ctypes.byref(exit_code),
    )
    return NativeResult(
        halt=halt,
        cycles=cycles.value,
        exit_code=exit_code.value,
        outputs=list(outputs[: n_out.value]),
        regs=list(regs),
    )
