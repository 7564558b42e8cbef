"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the standard way to exercise ICI-sharded code paths without a TPU pod
(SURVEY §4): XLA's host platform is split into 8 virtual devices so Mesh /
NamedSharding / collective tests run everywhere, deterministically.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep f32 default; some oracle comparisons opt into x64 locally
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS, so pin the platform through jax.config as well (must happen
# before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
