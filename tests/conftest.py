"""Test config: force CPU with 8 virtual devices so DP/FSDP sharding is
exercised without TPU hardware (SURVEY §4 'Implication for the rebuild').

The container registers the TPU backend at interpreter start (sitecustomize),
so the env-var route is too late here — but backends initialize lazily, and
``jax.config.update`` still wins as long as no device has been touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute e2e test (train loops, CLI pipelines)")


@pytest.fixture
def rng():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
