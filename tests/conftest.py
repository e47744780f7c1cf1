"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the driver validates real multi-chip paths separately via
__graft_entry__.dryrun_multichip)."""

import os

# Must be set before jax initializes its backends.  FORCE cpu: the ambient
# environment pins JAX_PLATFORMS to the real TPU tunnel ('axon'), and that
# plugin wins over the env var — jax.config.update is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
