"""Test harness: run everything on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

# NOTE: the session environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so plain env vars are too
# late here. Backends initialize lazily, so overriding via jax.config before
# any computation still works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped so tests are order-independent (a shared mutable RNG
    # made results depend on which test files ran first).
    return np.random.RandomState(42)
