"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are exercised on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the JAX-native
substitute for multi-node testing without a cluster (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config knob is honored, so set it too (before any backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_scan():
    from semanticlidarunc_tpu.dataset import synthetic
    return synthetic.make_scan(seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
