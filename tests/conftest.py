"""Test harness: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the harness environment exports JAX_PLATFORMS=axon (the real
# TPU), but unit tests must run on the virtual 8-device CPU mesh. Tests that
# need the real chip are marked @pytest.mark.tpu and spawn subprocesses.
# NOTE: the jaxtyping pytest plugin imports jax BEFORE this conftest, and jax
# snapshots JAX_PLATFORMS into its config at import — so the env var alone is
# not enough; update the live config too (the backend itself is not yet
# initialized at plugin-import time, so XLA_FLAGS still applies).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
os.environ.setdefault("COMPUTE_EPS", "1e-6")
os.environ.setdefault("RANDOM_SEED", "None")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


# Ground-truth embedding fixtures: vendored copy of the reference's C17
# sample data (tests/data/README.md). The env mount is only a fallback so
# the fixtures can be re-diffed against the original.
_VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "features")
REFERENCE_FIXTURES = (_VENDORED if os.path.isdir(_VENDORED)
                      else "/root/reference/data/features")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")
