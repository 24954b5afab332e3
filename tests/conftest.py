"""Test configuration: force an 8-device virtual CPU platform.

Sharding/parallelism tests run against a virtual mesh; numeric parity tests
compare against torch-CPU oracles, so CPU is the right platform for the whole
suite.  Real-TPU execution is exercised by bench.py and the driver.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box exposes a real
# TPU via an 'axon' plugin that overrides the env var; only
# jax.config.update('jax_platforms', ...) reliably wins).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "unit tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
