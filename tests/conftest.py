"""Test configuration.

Runs the whole suite on CPU with 8 virtual devices so the multi-chip
sharding logic is testable without TPUs (SURVEY §4 distributed-testing
note), and enables x64 so fp64 — the reference's primary precision — is
exact.  Must run before the first ``import jax`` anywhere in the tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start; the
# env var alone cannot override it — re-update before any backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
