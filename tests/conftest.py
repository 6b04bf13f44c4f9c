"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding correctness is validated on
host-platform virtual devices instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
