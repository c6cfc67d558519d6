"""Test configuration: force an 8-device virtual CPU mesh so sharding
tests run anywhere (the driver separately dry-runs the multi-chip path).

NOTE: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
environment variable, so the platform must be pinned via jax.config
before any backend initialization."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
