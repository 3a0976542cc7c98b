"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU backend eagerly and
pins ``jax_platforms``, so env vars alone are not enough — we override
the jax config before any backend is initialised. Multi-chip sharding
logic is validated with XLA's fake-device trick; real-TPU execution is
exercised by bench.py / __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: validation-scale parity tests (minutes on CPU); "
        "deselect with -m 'not slow'",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
