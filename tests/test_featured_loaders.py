"""Featured dataset loaders: the vendored TU fixture (tests/data/MUTAG,
real files on disk), Planetoid / ZINC / OGB raw-format parsing via
self-written standard-format fixtures, and the labeled pipeline
end-to-end through the main.py CLI."""

import gzip
import os
import pickle
import shutil

import numpy as np
import pytest

from desco_tpu.data.datasets import (
    load_data,
    load_ogb_arxiv,
    load_planetoid,
    load_tu_dataset,
    load_zinc,
)

FIXTURE_ROOT = os.path.join(os.path.dirname(__file__), "data")


def test_vendored_tu_fixture_loads():
    graphs = load_tu_dataset(FIXTURE_ROOT, "MUTAG", with_labels=True)
    assert len(graphs) == 6
    for g in graphs:
        assert g.n_nodes >= 7
        assert g.n_edges >= g.n_nodes - 1
        assert g.node_feat is not None and g.node_feat.shape[1] == 2
        np.testing.assert_allclose(g.node_feat.sum(-1), 1.0)


def test_load_data_tu_with_labels():
    graphs = load_data("MUTAG", FIXTURE_ROOT, with_labels=True)
    assert all(g.node_feat is not None for g in graphs)
    # split suffix works on file-backed data too
    test = load_data("MUTAG_test", FIXTURE_ROOT, with_labels=True)
    assert 0 < len(test) < len(graphs)


def test_planetoid_roundtrip(tmp_path):
    import scipy.sparse as sp

    # 7 nodes: 4 in allx, test ids 4..6 arriving shuffled [6, 4, 5]
    raw = tmp_path / "Cora" / "raw"
    raw.mkdir(parents=True)
    f = 5
    allx = sp.csr_matrix(np.arange(20, dtype=np.float32).reshape(4, f))
    tx = sp.csr_matrix(np.array(
        [[60] * f, [40] * f, [50] * f], dtype=np.float32))
    ally = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
    ty = np.eye(3, dtype=np.float32)[[2, 0, 1]]
    graph = {0: [1, 4], 1: [0, 2], 2: [1, 3], 3: [2], 4: [0, 5],
             5: [4, 6], 6: [5]}
    for name, obj in (("allx", allx), ("tx", tx), ("ally", ally),
                      ("ty", ty), ("graph", graph)):
        with open(raw / f"ind.cora.{name}", "wb") as fh:
            pickle.dump(obj, fh)
    (raw / "ind.cora.test.index").write_text("6\n4\n5\n")

    [g] = load_planetoid(str(tmp_path), "Cora")
    assert g.n_nodes == 7
    # shuffled test rows permuted into position: row 6 holds the first
    # pickled test row (value 60), labels follow the same permutation
    np.testing.assert_allclose(g.node_feat[6, :f], 60.0)
    np.testing.assert_allclose(g.node_feat[4, :f], 40.0)
    np.testing.assert_allclose(g.node_feat[5, :f], 50.0)
    assert g.node_feat[6, -1] == 2.0  # label column
    assert g.n_edges == 6


def test_zinc_roundtrip(tmp_path):
    raw = tmp_path / "ZINC" / "raw"
    raw.mkdir(parents=True)
    mols = []
    for n in (4, 5):
        bond = np.zeros((n, n), np.int64)
        for i in range(n - 1):
            bond[i, i + 1] = bond[i + 1, i] = 1
        mols.append({"num_atom": n,
                     "atom_type": np.arange(n, dtype=np.int64),
                     "bond_type": bond})
    with open(raw / "train.pickle", "wb") as fh:
        pickle.dump(mols, fh)
    graphs = load_zinc(str(tmp_path))
    assert [g.n_nodes for g in graphs] == [4, 5]
    assert graphs[0].node_feat.shape == (4, 28)
    assert graphs[0].n_edges == 3


def test_ogb_arxiv_roundtrip(tmp_path):
    raw = tmp_path / "arXiv" / "raw"
    raw.mkdir(parents=True)

    def wr(name, arr):
        with gzip.open(raw / name, "wt") as fh:
            for row in np.atleast_2d(arr):
                fh.write(",".join(str(float(v)) for v in row) + "\n")

    wr("edge.csv.gz", np.array([[0, 1], [1, 2], [2, 0], [1, 1]]))
    wr("node-feat.csv.gz", np.arange(12, dtype=np.float32).reshape(3, 4))
    wr("node-label.csv.gz", np.array([[0.0], [1.0], [2.0]]))
    [g] = load_ogb_arxiv(str(tmp_path))
    assert g.n_nodes == 3 and g.n_edges == 3  # self-loop dropped
    assert g.node_feat.shape == (3, 5)  # 4 features + label column
    assert g.node_feat[2, -1] == 2.0


@pytest.mark.slow
def test_main_cli_labeled_end_to_end(tmp_path):
    """main.py --test_dataset MUTAG from the vendored fixture files, in
    labeled (node-feature) mode — the full file-loader + labeled-truth +
    two-stage pipeline path (VERDICT round-1 item 7)."""
    import main as main_mod

    data_root = tmp_path / "data"
    data_root.mkdir()
    shutil.copytree(os.path.join(FIXTURE_ROOT, "MUTAG"),
                    data_root / "MUTAG")
    out = tmp_path / "out"
    rc = main_mod.main([
        "--train_dataset", "MUTAG", "--valid_dataset", "MUTAG",
        "--test_dataset", "MUTAG_test",
        "--query_sizes", "3",
        "--use_node_feature", "--neigh_input_dim", "2",
        "--neigh_epoch_num", "1", "--gossip_epoch_num", "1",
        "--neigh_layer_num", "2", "--depth", "3",
        "--neigh_batch_size", "16", "--gossip_batch_size", "8",
        "--train_neigh", "--train_gossip", "--test_gossip",
        "--data_root", str(data_root), "--output_dir", str(out),
        "--neigh_model_path", str(tmp_path / "neigh"),
        "--gossip_model_path", str(tmp_path / "gossip"),
    ])
    assert rc == 0
    res = (out / "analyze_results_MUTAG_test.txt").read_text()
    assert "norm_mse_gossip" in res
