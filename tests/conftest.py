"""Test configuration: force an 8-device CPU platform for sharding tests.

Multi-chip TPU hardware is unavailable in CI; all sharding/collective tests
run on a virtual 8-device CPU mesh (``xla_force_host_platform_device_count``),
the standard JAX technique for testing pjit/shard_map layouts.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
