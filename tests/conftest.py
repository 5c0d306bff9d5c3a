"""Test configuration: run on CPU (float64 parity), 8 virtual devices for
sharding tests (SURVEY.md section 7 / task environment notes)."""
import os

os.environ.setdefault("JAX_ENABLE_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_1d():
    path = os.path.join(os.path.dirname(__file__), "golden", "ref_1d.npz")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_2d():
    path = os.path.join(os.path.dirname(__file__), "golden", "ref_2d_n32.npz")
    return np.load(path)
