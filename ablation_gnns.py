"""Ablation: SHMP vs plain homogeneous GNNs.

Counterpart of the reference's ablation_gnns.py: the same two-stage
pipeline with ``use_hetero=False, use_tconv=False`` — one node type, one
edge type, canonical-ness conveyed only through a one-hot input feature
(get_neigh_canonical semantics, data.py:353-372; driver settings
ablation_gnns.py:558-563). Expressivity ablation for the paper's
heterogeneous message passing claim.

Usage: python ablation_gnns.py --train_dataset Syn_1827
       --test_dataset Syn_1827_test --neigh_conv_type SAGE|GIN ...
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from main import main as run_main

    argv = list(sys.argv[1:] if argv is None else argv)
    argv += ["--no-use_hetero", "--no-use_tconv"]
    return run_main(argv)


if __name__ == "__main__":
    sys.exit(main())
