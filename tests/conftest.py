"""Test configuration: force an 8-device virtual CPU platform (so sharding
tests run without TPU hardware) and enable float64.

Note: the environment may pre-register a TPU platform plugin (e.g. 'axon')
via sitecustomize and export JAX_PLATFORMS pointing at it; a plain
``os.environ.setdefault`` is not enough, so we hard-override the platform
through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
