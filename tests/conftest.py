"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on forced host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) per SURVEY.md sec 4;
the real-TPU path is exercised by bench.py and the driver's compile checks.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is ignored; only
# jax.config.update("jax_platforms", ...) reliably selects the CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
