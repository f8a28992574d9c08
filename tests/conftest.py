"""Test configuration: run JAX on CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py / the driver; tests validate
semantics and multi-device sharding on the host platform.  The environment
pins JAX_PLATFORMS=axon (the TPU tunnel), so we must override it before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
