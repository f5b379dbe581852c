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


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    XLA:CPU's LLVM JIT segfaults nondeterministically deep into a long
    single-process run (observed consistently ~130 compiles in, inside
    backend_compile of the oracle renderer); dropping the compile caches
    at module boundaries keeps the JIT arena small. Costs recompiles,
    buys a suite that finishes."""
    yield
    jax.clear_caches()
