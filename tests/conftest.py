"""Test configuration: force an 8-device CPU mesh before any backend init.

Multi-device tests emulate a v5e-8 mesh on CPU per SURVEY.md §4
("Multi-device tests without a cluster").  The environment's sitecustomize
pre-sets JAX_PLATFORMS=axon (the real TPU tunnel), so the platform must be
overridden through jax.config, not env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
