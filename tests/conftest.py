"""Test configuration: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware.

The ambient environment pins JAX_PLATFORMS to the single-client TPU tunnel and
overrides the env var at import, so we must use jax.config.update explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
