"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (the standard JAX trick); the
driver separately compile-checks the TPU path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-registers itself regardless of
# JAX_PLATFORMS; override at the config level so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by full-engine XLA compiles or subprocess meshes; run
# the fast loop with `pytest -m "not slow"` (marker registered in pytest.ini).
SLOW_MODULES = {
    "test_engine",
    "test_head_variants",
    "test_multihost",
    "test_sam",
    "test_autobackend",
    "test_classify",
    "test_rtdetr",
    "test_yolo",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
