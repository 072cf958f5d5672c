"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding/batching tests need multiple devices; real multi-chip hardware is not
available in CI, so we run on the host platform with 8 virtual devices
(SURVEY.md §4). The container pre-imports jax with JAX_PLATFORMS=axon (a
remote-TPU relay), so plain env vars are too late — we must override through
jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running battery (MuJoCo transfer/contact sweeps, long "
        "rollouts). Quick correctness pass: pytest -m 'not slow' (<10 min); "
        "full suite runs everything (~40 min).",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
