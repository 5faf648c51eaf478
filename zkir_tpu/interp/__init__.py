"""Batched columnar TPU interpreter.

The reference's per-cycle scalar loop (``zkir-runtime/src/vm.rs:208-348``)
becomes a single jitted, branch-free step function scanned over cycles with
``lax.scan``; lanes (program instances) form the parallel axis, and trace
columns are emitted directly as scan outputs in HBM.
"""

from .columnar import (
    InterpConfig,
    MachineState,
    TpuInterpreter,
    HALT_NONE,
    HALT_EBREAK,
    HALT_EXIT,
    HALT_CYCLE_LIMIT,
    HALT_ERROR,
    PAUSE_CRYPTO,
)
