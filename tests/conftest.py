"""Test environment: force CPU with 8 virtual devices so data-parallel
sharding is testable without a TPU (SPMD code is identical; only the
platform differs)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import numpy as np
import pytest

import jax

# This container's sitecustomize may force-register a TPU PJRT plugin at
# interpreter startup, which overrides the JAX_PLATFORMS env var; the
# config update below wins as long as no backend has been used yet, so
# tests really run on the 8-device virtual CPU mesh, not the shared chip.
jax.config.update("jax_platforms", "cpu")

# Golden-parity tests compare f32 numerics against the torch reference;
# XLA's default conv/matmul precision on CPU/TPU uses fast lower-precision
# passes, so pin full f32 for the test session.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite's cost is dominated by XLA
# compiles of the same small programs; cached entries make re-runs and
# the e2e CLI subprocesses (which share this dir via
# JAX_COMPILATION_CACHE_DIR) far cheaper.
_CACHE = str(pathlib.Path(__file__).parent.parent / ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (minutes on this 1-core host)")


GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def load_golden(name):
    return np.load(GOLDEN / name)
