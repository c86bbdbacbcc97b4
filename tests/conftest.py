"""Test harness: run everything on CPU with 8 virtual devices so distributed
code paths (Mesh/shard_map/psum) are exercised without real multi-chip
hardware (SURVEY.md §6 item 5).

Environment quirk: /root/.axon_site/sitecustomize.py registers the axon TPU
PJRT plugin at interpreter startup and forces jax_platforms=axon, overriding
the JAX_PLATFORMS env var. Env-var tricks therefore don't work; we must
re-override via jax.config.update BEFORE the first backend initialization
(which is lazy, so doing it here in conftest is early enough).
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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
