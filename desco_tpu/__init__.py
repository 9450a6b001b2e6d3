"""desco_tpu — a TPU-native deep subgraph-counting framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of fuvty/DeSCo
(WSDM'24): canonical-partition neighborhood extraction, SHMP neighborhood
count regression, and gossip-propagation refinement — designed for TPU
(static-shape packed batches, typed-edge segment-sum kernels, shard_map
data/graph parallelism) rather than ported from the reference's
PyG/Lightning stack.
"""

import os as _os
import sys as _sys

# NumPy madvises transparent hugepages for large buffers; with THP
# "madvise" mode this host does synchronous compaction on fault and large
# np.full/np.empty writes crawl at ~10MB/s (150x slowdown). Must be set
# before numpy is first imported.
if "numpy" not in _sys.modules:
    _os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

__version__ = "0.1.0"

# Public API (lazy — importing desco_tpu stays cheap; jax loads only when
# a symbol that needs it is touched). These are the library-boundary
# entry points: graph container, query machinery, canonical partition,
# exact counting, and the serving facade.
_EXPORTS = {
    "Graph": ("desco_tpu.graph.container", "Graph"),
    "Neighborhood": ("desco_tpu.graph.canonical", "Neighborhood"),
    "canonical_neighborhood": ("desco_tpu.graph.canonical",
                               "canonical_neighborhood"),
    "extract_all_neighborhoods": ("desco_tpu.graph.canonical",
                                  "extract_all_neighborhoods"),
    "gen_query_ids": ("desco_tpu.graph.atlas", "gen_query_ids"),
    "gen_queries": ("desco_tpu.graph.atlas", "gen_queries"),
    "canonical_counts": ("desco_tpu.truth.vf2", "canonical_counts"),
    "graphlet_counts": ("desco_tpu.truth.vf2", "graphlet_counts"),
    "CountingService": ("desco_tpu.serving", "CountingService"),
}

__all__ = ["__version__", *_EXPORTS]


def __getattr__(name):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module 'desco_tpu' has no attribute {name!r}") from None
    import importlib

    value = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return sorted(__all__)
