"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX-native answer to testing multi-chip sharding without a
cluster (SURVEY §4c): XLA exposes N fake CPU devices, pjit/shard_map compile
and execute real collectives over them.
"""

import os

# The harness preloads jax via a sitecustomize (PYTHONPATH=/root/.axon_site)
# with JAX_PLATFORMS=axon latched at import — env vars set here are too late.
# Backends are still lazy, so jax.config.update works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on fake CPU devices"
assert jax.device_count() == 8, (
    "jax backend initialized before conftest could set "
    "xla_force_host_platform_device_count")

# JAX CPU matmuls default to a fast low-precision path (measured ~6e-2 abs
# error vs f64 on unit-scale inputs); parity tests against torch need true f32.
jax.config.update("jax_default_matmul_precision", "highest")
