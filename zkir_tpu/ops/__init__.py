"""Device kernels (Pallas / jnp) and their scalar reference implementations.

- ``field_ops``     — vectorized Mersenne-31 add/sub/mul/neg/pow/inv.
- ``poseidon2_ref`` — scalar Poseidon2-M31 reference (parameter generation).
- ``poseidon2``     — batched Poseidon2 permutation kernel.
- ``sha256``        — batched SHA-256 compression kernel.
- ``ntt``           — radix-2 NTT over the CM31 complex extension.
"""
