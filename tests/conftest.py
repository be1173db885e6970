import os

# Force an 8-device virtual CPU mesh for every test: sharding logic is
# exercised exactly as it would run on a v5e-8 slice, minus the ICI.
#
# The container boots with an `axon` PJRT plugin that force-selects the
# remote TPU via jax.config (sitecustomize), overriding JAX_PLATFORMS.
# Tests must be hermetic and fast, so we claw the selection back to CPU
# *before* any backend is initialised.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
