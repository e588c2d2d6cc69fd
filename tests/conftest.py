"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (mirrors the reference's
distributed-without-a-cluster test strategy, SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS; force cpu explicitly.
jax.config.update("jax_platforms", "cpu")
# CPU XLA convs default to a reduced-precision oneDNN path; parity tests
# need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
