"""Test config: run everything on CPU with 8 virtual devices so sharding
tests are hardware-independent (SURVEY §4 target test strategy).

NOTE: this environment's sitecustomize force-selects the tunneled "axon"
TPU backend via jax.config (ignoring JAX_PLATFORMS env), so we must override
with a config update BEFORE any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
