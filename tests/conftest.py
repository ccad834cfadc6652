"""Force an 8-device virtual CPU platform for all tests.

Multi-chip sharding is validated on a virtual mesh (SURVEY.md §4): TPU hardware
is not needed (or touched) by the test suite.

Note: the session environment imports jax from sitecustomize with
``JAX_PLATFORMS=axon`` already captured into jax's config, so plain env-var
edits here are too late — we override through ``jax.config`` before any
backend initialisation instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
