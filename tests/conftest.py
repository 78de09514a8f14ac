"""Test config: force an 8-device CPU platform so data-parallel mesh tests
run without TPU hardware (SURVEY.md §4.4 — the standard JAX trick).

Note: the axon TPU plugin in this environment overrides the JAX_PLATFORMS
env var, so the platform must be forced through jax.config before any
backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
