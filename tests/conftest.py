"""Test harness: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding (shard_map/pjit over a Mesh) is exercised on host CPU
devices, mirroring how the driver dry-runs the multichip path
(SURVEY.md §4: no real multi-chip hardware in this environment).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
