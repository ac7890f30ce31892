"""Test environment: CPU backend with 8 virtual devices emulating the v5e-8
mesh (SURVEY.md §4).

Note: this machine's profile pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) in
a way that overrides the env var, so the CPU backend must be forced via
``jax.config`` — and XLA_FLAGS must be set before the CPU client initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect the 8-device virtual mesh"


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
