"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md §4.4 — multi-device sharding (pjit/shard_map/psum) is tested
on host-platform virtual devices; the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize hook force-sets jax_platforms="axon,cpu" at interpreter
# start, ignoring the env var — override it programmatically before any device
# use so the suite runs on 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
