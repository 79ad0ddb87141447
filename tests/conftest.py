"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax (or anything importing jax) is loaded — pytest
imports conftest first, so this is the right place.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Never touch the network in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# This machine's site config pre-sets jax_platforms to "axon,cpu" (the real
# TPU tunnel), which silently overrides JAX_PLATFORMS — force CPU explicitly
# or tests contend for the one physical TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
