"""Force an 8-device virtual CPU platform for all tests.

Multi-chip sharding is validated on a virtual mesh (SURVEY.md §4): TPU hardware
is not needed (or touched) by the test suite. Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
