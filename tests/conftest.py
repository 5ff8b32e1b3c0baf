"""Test configuration: force an 8-virtual-device CPU mesh.

The environment may pre-register a TPU PJRT plugin at interpreter start
(before conftest runs), so simply setting JAX_PLATFORMS here is not
enough — we update the jax config and clear any already-initialized
backends. This replaces the reference's nonexistent distributed-test
story (SURVEY.md §4): every multi-chip sharding test runs against 8
virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends  # noqa: E402
except ImportError:  # pragma: no cover - older jax
    from jax._src.api import clear_backends  # noqa: E402
clear_backends()
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
