"""Test configuration: force an 8-device CPU platform for all tests.

Multi-chip TPU hardware is unavailable in CI; all sharding/collective tests
run on a virtual 8-device CPU mesh (``xla_force_host_platform_device_count``),
the standard JAX technique for testing pjit/shard_map layouts.

NOTE: the axon TPU plugin in this image ignores the ``JAX_PLATFORMS``
environment variable, so we must force the platform through
``jax.config`` before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover compiles one kernel per
# (shape, stage) — Merkle levels alone are ~12 shapes x ~9 s on CPU.
# Caching them on disk makes repeat test runs dominated by actual
# compute.  Lives under the repo (.zkir_cache), not /tmp, so it
# survives across sessions on the same checkout.
from zkir_tpu.prover.constraints import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(cache_dir(), "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
