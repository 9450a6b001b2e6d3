from .vf2 import canonical_counts, graphlet_counts, symmetric_factor, count_induced_embeddings
