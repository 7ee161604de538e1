"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's trick of exercising tensor parallelism without real
accelerators (reference: integration_tests/test_server.py:396-420 uses gloo on
CPU); here we use XLA host-platform virtual devices instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# A sitecustomize hook may have force-registered a TPU platform and overridden
# the env var via jax.config; re-assert CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
