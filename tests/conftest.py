"""Test harness: force JAX onto a virtual 8-device CPU platform.

SURVEY.md §4: JAX's CPU backend with
``--xla_force_host_platform_device_count=8`` is the "fake cluster" —
the same ``shard_map`` code paths that run on a v5e-8 run here in CI,
so rotation-sharding and top-K-merge logic are testable without TPUs.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os

# NOTE: the JAX_PLATFORMS env var is ignored once the axon TPU PJRT
# plugin registers itself; the config API below is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
