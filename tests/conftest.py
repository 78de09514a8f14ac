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


# --- test tiering (VERDICT r3 #6) -----------------------------------------
# Full-model XLA compiles dominate the ~30 min suite. Modules listed here
# are auto-marked `slow`; `pytest -m "not slow"` runs the fast unit tier
# (target < ~5 min on one core). Individual tests can also carry an explicit
# @pytest.mark.slow.
SLOW_MODULES = {
    "test_cli",
    "test_cli_train",
    "test_convergence",
    "test_convert_cli",
    "test_dcpdn_oracle",
    "test_dist",
    "test_export",
    "test_fdgan",
    "test_fdgan_fast",
    "test_golden_e2e",
    "test_lifecycle",
    "test_pallas_dense",
    "test_serve",
    "test_tiling_fdgan",
    "test_multiprocess",
    "test_native_runner",
    "test_train",
    "test_train_pool",
    "test_vgg16",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module and item.module.__name__.split(".")[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
