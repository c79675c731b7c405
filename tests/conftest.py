"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Tests exercise the multi-chip sharding path without TPU hardware, exactly how
the driver's ``dryrun_multichip`` validates it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by the interpreter's site hooks with the TPU
# platform pre-selected, in which case the env var above is too late — force
# the platform through the config API as well (before any backend init).
import jax

jax.config.update("jax_platforms", "cpu")

# CPU compiles of the bigger models dominate test time; cache them on disk so
# repeat runs are fast.
_cache_dir = os.environ.get(
    "LSS_TEST_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_test_compilation"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
