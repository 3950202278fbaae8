"""Test harness: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("COMPUTE_EPS", "1e-6")
os.environ.setdefault("RANDOM_SEED", "None")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


REFERENCE_FIXTURES = "/root/reference/data/features"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")
