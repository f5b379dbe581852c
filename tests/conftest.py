"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding paths are tested on a virtual CPU mesh (SURVEY.md §4c).
The environment's sitecustomize force-registers the axon TPU backend and
overrides JAX_PLATFORMS, so we must re-select the CPU backend via
jax.config *before* any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
