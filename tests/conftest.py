"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
