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
