"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding correctness is validated on
host-platform virtual devices instead. Set PIENERF_TEST_TPU=1 to run the
suite against the real chip.

Note: the f64 GMLS/assembly precompute runs in numpy, so tests do not enable
jax_enable_x64 — the jitted per-step code is float32 exactly as on TPU.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax  # noqa: E402

if not os.environ.get("PIENERF_TEST_TPU"):
    # The hosted TPU plugin ignores the JAX_PLATFORMS env var; the config
    # knob is authoritative.
    jax.config.update("jax_platforms", "cpu")
