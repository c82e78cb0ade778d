"""Test harness config: force CPU backend with 8 virtual devices.

The reference codebase (see SURVEY.md section 4) ships no tests; we build the
test pyramid ourselves. Multi-chip sharding is validated on a virtual 8-device
CPU mesh so tests run anywhere; the driver separately dry-runs the multi-chip
path (see __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may force a TPU platform via site config regardless of
# JAX_PLATFORMS; override it after import, before first device use.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
