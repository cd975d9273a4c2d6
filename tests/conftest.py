"""Test configuration: run all tests on an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to present 8 devices. The environment's sitecustomize registers
an 'axon' TPU plugin and pins JAX_PLATFORMS, so we override via
jax.config after import (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()
