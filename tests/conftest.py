"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic (pjit/shard_map over a Mesh) is exercised without
TPU hardware exactly as SURVEY.md section 4 prescribes: the same SPMD code
runs on 1 chip / N virtual CPU devices, and the driver's dryrun separately
compile-checks the multi-chip path.  Env vars must be set before jax imports.
"""

import os

# HARD-set (not setdefault): the container exports JAX_PLATFORMS=axon and a
# sitecustomize registers the axon TPU plugin with jax_platforms="axon,cpu",
# so only an explicit config update after import reliably pins tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles of the limb kernels dominate
# suite wall time on small hosts; cache them across runs.  Env-var mapping
# does not engage in this container, so use the config API directly.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# NOTE: "jax_persistent_cache_enable_xla_caches: all" segfaulted inside
# put_executable_and_time on this box (reproducibly, while serializing one
# of the MSM executables); the default executable-only cache is stable.
