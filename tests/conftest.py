"""Test harness: force JAX onto a virtual 8-device CPU platform.

This is the standard fake-multi-device setup for a TPU-first codebase
(SURVEY.md §4): multi-chip sharding tests run on host CPU devices, the
real TPU is exercised by bench.py and the driver.
"""
import os

# Force CPU even if the ambient environment points JAX at a TPU platform
# (the driver environment presets JAX_PLATFORMS, and jax may already be
# imported by a pytest plugin, so set both the env var and the config):
# unit tests must never compile against the tunneled chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1673551)
