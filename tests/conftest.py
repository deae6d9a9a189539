"""Test configuration: run on CPU with 8 virtual devices (sharding tests)
and float64 enabled so math checks can use tight tolerances (the reference
C++ library is double-precision throughout).

NOTE: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and the
axon sitecustomize force-registers that backend; `jax.config.update` after
import wins over both, as long as no backend has been initialized yet —
keep this file free of jax array operations.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
