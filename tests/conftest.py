"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX-native answer to testing multi-chip sharding without a
cluster (SURVEY §4c): XLA exposes N fake CPU devices, pjit/shard_map compile
and execute real collectives over them.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
