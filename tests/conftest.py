"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic (pjit/shard_map over a Mesh) is exercised without
TPU hardware exactly as SURVEY.md section 4 prescribes: the same SPMD code
runs on 1 chip / N virtual CPU devices, and the driver's dryrun separately
compile-checks the multi-chip path.  Env vars must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
