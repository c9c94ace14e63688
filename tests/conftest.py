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

# JAX CPU matmuls default to a fast low-precision path (measured ~6e-2 abs
# error vs f64 on unit-scale inputs); parity tests against torch need true f32.
import jax

jax.config.update("jax_default_matmul_precision", "highest")
