"""Test configuration.

All tests run on the CPU backend with 8 virtual devices (so multi-chip
sharding paths are exercised without TPU hardware) and with x64 enabled
(numerical parity with the reference's float64 policy, gptorch/util.py:11-12).

This is the TPU-build answer to the reference's skip-on-no-CUDA strategy
(reference test/util.py:8-22): instead of xfail-ing accelerator tests, we
emulate the device mesh on host.
"""

import os

# Must happen before jax initializes a backend.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU plugin (if present) registers itself with priority regardless of
# the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
