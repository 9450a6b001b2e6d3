"""desco_tpu — a TPU-native deep subgraph-counting framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of fuvty/DeSCo
(WSDM'24): canonical-partition neighborhood extraction, SHMP neighborhood
count regression, and gossip-propagation refinement — designed for TPU
(static-shape packed batches, typed-edge segment-sum kernels, shard_map
data/graph parallelism) rather than ported from the reference's
PyG/Lightning stack.
"""

__version__ = "0.1.0"
