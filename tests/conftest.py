"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware.

Note: this environment preloads a TPU PJRT plugin via sitecustomize (jax is
already imported by the time conftest runs), so the env-var route
(JAX_PLATFORMS=cpu) is too late — we must use jax.config.update instead.
XLA_FLAGS is still read lazily at first backend initialization, so setting it
here works as long as no test module touched a backend at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
