"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware."""

import os

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the tunneled TPU), so env edits here are too late —
# use jax.config, which works any time before backend initialization.
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


def random_graph(rng, n, p):
    """ER graph as a host Graph (import-light helper shared by tests)."""
    from desco_tpu.graph import Graph

    iu = np.triu_indices(n, k=1)
    mask = rng.random(len(iu[0])) < p
    edges = np.stack([iu[0][mask], iu[1][mask]], axis=1).astype(np.int32)
    return Graph(n, edges)
