"""Test config: force an 8-virtual-device CPU platform.

The container's sitecustomize registers the experimental `axon` TPU backend
at interpreter startup and pins JAX_PLATFORMS=axon, so plain env vars are
not enough — we must override the jax config before any backend is
initialized.  All tests run on CPU; multi-chip sharding tests use the 8
fake host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA:CPU compiles dominate suite wall time;
# warm runs reuse them (keyed by platform+HLO hash, safe on miss)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
