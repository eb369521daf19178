"""Test harness: force an 8-device virtual CPU platform before backend init.

Multi-chip sharding (shard_map/pjit over a Mesh) is exercised on host CPU
devices, mirroring how the driver dry-runs the multichip path. Note: this
environment pre-imports jax at interpreter startup (JAX_PLATFORMS=axon points
at the real TPU), so we must flip the platform through jax.config, which
works as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: first-compile in this environment is slow
# (~10-30s per executable); cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (may already be in sys.modules via sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
