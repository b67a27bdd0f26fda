"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 implication)."""

import os

# The driver env presets JAX_PLATFORMS=axon (TPU) and a sitecustomize imports
# jax at interpreter startup, so plain env mutation is too late; update the
# jax config directly (backends initialise lazily, so this still wins).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_SRC)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


requires_torch = pytest.mark.skipif(not has_torch(), reason="torch not available")
requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()), reason="reference repo or torch not available"
)


@pytest.fixture(scope="session")
def reference_src():
    """Put the reference repo on sys.path so its torch models can serve as
    parity oracles (we import the reference's code at test time; nothing is
    copied into this repo)."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    yield REFERENCE_SRC


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
