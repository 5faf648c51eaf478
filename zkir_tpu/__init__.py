"""zkir-tpu: a TPU-native ZK-IR v3.4 proving framework built from scratch in
JAX/XLA/Pallas.

Capability target: the ``seceq/zkir`` reference toolchain (spec v3.4 —
Mersenne-31 field, variable-limb 40-bit values, 16-register / 50-instruction
ISA, deferred-carry execution with range-check and normalization witnesses;
see reference ``zkir-spec/src/lib.rs:1-12``), re-architected TPU-first:

- ``zkir_tpu.spec``    — host-side data model: Config, encoding bitfields,
  opcode tables, Program binary format, Mersenne-31 scalar field.
- ``zkir_tpu.asm``     — assembler / disassembler, bit-compatible with the
  reference encoders (reference ``zkir-assembler``, ``zkir-disassembler``).
- ``zkir_tpu.runtime`` — scalar oracle VM with full witness generation
  (reference ``zkir-runtime``): the differential-test oracle.
- ``zkir_tpu.interp``  — the batched columnar TPU interpreter: jitted step
  function, ``lax.scan`` over cycles, trace columns emitted directly in HBM.
- ``zkir_tpu.ops``     — Pallas/jnp device kernels: vectorized M31 field ops,
  batched SHA-256, Poseidon2 over M31, NTT over the CM31 extension.
- ``zkir_tpu.prover``  — Plonky3-style commitment pipeline: LDE, Merkle, FRI.
- ``zkir_tpu.parallel``— mesh/sharding layer: trace-row sharding, distributed
  NTT butterfly exchange, collective Merkle/FRI reductions.

64-bit integer support is required for the 40/60-bit packed register
representation used by the interpreter; on TPU, XLA lowers u64 ops to
u32-pair arithmetic automatically.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
