"""Dataset registry: TU reader, SNAP reader, suffix conventions."""

import os

import numpy as np
import pytest

from desco_tpu.data.datasets import load_data, load_snap_edgelist, load_tu_dataset
from desco_tpu.graph.atlas import gen_queries, gen_query_ids, graph_atlas_plus


def write_tu(root, name, graphs, labels=None):
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    off = 1
    with open(os.path.join(raw, f"{name}_A.txt"), "w") as fa, \
            open(os.path.join(raw, f"{name}_graph_indicator.txt"),
                 "w") as fi:
        for gid, (n, edges) in enumerate(graphs):
            for _ in range(n):
                fi.write(f"{gid + 1}\n")
            for u, v in edges:
                fa.write(f"{u + off}, {v + off}\n")
                fa.write(f"{v + off}, {u + off}\n")
            off += n
    if labels is not None:
        with open(os.path.join(raw, f"{name}_node_labels.txt"), "w") as f:
            for l in labels:
                f.write(f"{l}\n")


def test_tu_reader(tmp_path):
    write_tu(str(tmp_path), "TOY",
             [(3, [(0, 1), (1, 2)]), (4, [(0, 1), (2, 3), (1, 2)])],
             labels=[0, 1, 0, 1, 1, 0, 0])
    gs = load_tu_dataset(str(tmp_path), "TOY", with_labels=True)
    assert len(gs) == 2
    assert gs[0].n_nodes == 3 and gs[0].n_edges == 2
    assert gs[1].n_nodes == 4 and gs[1].n_edges == 3
    assert gs[0].node_feat.shape == (3, 2)  # one-hot of 2 labels
    np.testing.assert_allclose(gs[0].node_feat.sum(-1), 1.0)


def test_tu_reader_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_tu_dataset(str(tmp_path), "NOPE")


def test_snap_reader(tmp_path):
    raw = tmp_path / "P2P" / "raw"
    raw.mkdir(parents=True)
    (raw / "edges.txt").write_text(
        "# comment\n10 20\n20 30\n30 10\n10 20\n")
    [g] = load_snap_edgelist(str(tmp_path), "P2P")
    assert g.n_nodes == 3 and g.n_edges == 3  # deduped triangle


def test_split_suffixes(tmp_path):
    graphs = [(5, [(0, 1), (1, 2), (3, 4)])] * 8
    write_tu(str(tmp_path), "TOY2", graphs)
    # registry name must exist: use Syn instead for splits (TOY2 not in
    # registry) — exercise split logic through Syn_8
    full = load_data("Syn_8", str(tmp_path))
    tr = load_data("Syn_8_train", str(tmp_path))
    va = load_data("Syn_8_val", str(tmp_path))
    te = load_data("Syn_8_test", str(tmp_path))
    assert len(tr) == 2 and len(va) == 2 and len(te) == 4
    assert len(full) == 8
    # deterministic
    tr2 = load_data("Syn_8_train", str(tmp_path))
    assert [g.n_nodes for g in tr] == [g.n_nodes for g in tr2]


def test_relabel_suffix(tmp_path):
    gs = load_data("Syn_8_decreaseByDegree", str(tmp_path))
    for g in gs:
        deg = g.degrees()
        assert np.all(np.diff(deg) <= 0)  # nonincreasing by node id


def test_combined_syn_distribution():
    """generate_combined_syn matches the documented deepsnap-ensemble
    mix (combined_syn.py:10-142 + data.py:444-467): uniform sizes in
    (min, max], all graphs connected, and a density/degree spread that
    spans the four generator families (ER-sparse through PLC-clustered)
    rather than a single generator's band."""
    import networkx as nx

    from desco_tpu.data.synthetic import generate_combined_syn

    graphs = generate_combined_syn(120, min_size=5, max_size=41, seed=7)
    assert len(graphs) == 120
    sizes = np.array([g.n_nodes for g in graphs])
    # BA/PLC shrink to largest CC, so sizes are <= the drawn value;
    # the raw draw is uniform over [6, 41]
    assert sizes.max() <= 41 and sizes.min() >= 2
    assert (sizes >= 30).sum() > 10  # top of the range is populated
    for g in graphs[:40]:
        nxg = nx.Graph()
        nxg.add_nodes_from(range(g.n_nodes))
        nxg.add_edges_from(g.edges.tolist())
        assert nx.is_connected(nxg), "ensemble graphs must be connected"
    # generator diversity shows as a wide mean-degree spread: ER/WS sit
    # near log2(n) edges-per-node, BA/PLC reach much denser regimes
    mean_deg = np.array([2 * g.n_edges / max(g.n_nodes, 1)
                         for g in graphs])
    assert mean_deg.min() < 4.0 and mean_deg.max() > 8.0
    # determinism: same seed -> identical dataset
    again = generate_combined_syn(120, min_size=5, max_size=41, seed=7)
    assert all(np.array_equal(a.edges, b.edges)
               for a, b in zip(graphs, again))


def test_extended_atlas_patterns():
    import networkx as nx

    for qid in (8000, 9000, 10001, 14004):
        g = graph_atlas_plus(qid)
        assert g.number_of_nodes() == qid // 1000
        assert nx.is_connected(g)


def test_tu_proxy_statistics(tmp_path):
    """The TU-proxy families (tu_proxy.py) track the published summary
    statistics of the datasets they stand in for, are connected, simple,
    deterministic in seed, and round-trip through the disk cache."""
    import networkx as nx

    from desco_tpu.data.tu_proxy import (
        TU_PROXY_RECIPES, load_or_generate_proxy)

    published = {  # (mean nodes, mean edges), TUDataset statistics
        "ChemProxy": (17.93, 19.79),
        "ChemBigProxy": (41.22, 43.45),
        "GeoProxy": (32.63, 62.14),
        "EgoProxy": (19.77, 96.53),
        "SuperpixelProxy": (77.52, 198.32),
    }
    for name, (fn, count, kw) in TU_PROXY_RECIPES.items():
        sample = min(count, 80)
        graphs = fn(sample, seed=0, **kw)
        ns = np.mean([g.n_nodes for g in graphs])
        ms = np.mean([g.n_edges for g in graphs])
        pn, pm = published[name]
        assert abs(ns - pn) / pn < 0.25, (name, ns, pn)
        assert abs(ms - pm) / pm < 0.35, (name, ms, pm)
        for g in graphs[:20]:
            nxg = nx.Graph()
            nxg.add_nodes_from(range(g.n_nodes))
            nxg.add_edges_from(g.edges.tolist())
            assert nx.is_connected(nxg)
            assert nxg.number_of_edges() == g.n_edges  # simple, no dupes
        again = fn(sample, seed=0, **kw)
        assert all(np.array_equal(a.edges, b.edges)
                   for a, b in zip(graphs, again))
    # valence cap holds for the chemistry family
    fn, _, kw = TU_PROXY_RECIPES["ChemProxy"]
    for g in fn(40, seed=3, **kw):
        deg = np.zeros(g.n_nodes, np.int64)
        np.add.at(deg, g.edges.ravel(), 1)
        assert deg.max() <= 4

    # disk cache round-trip through the shared raw format + load_data
    got = load_or_generate_proxy("ChemProxy", str(tmp_path / "ChemProxy"))
    cached = load_or_generate_proxy("ChemProxy", str(tmp_path / "ChemProxy"))
    assert len(got) == 188 and len(cached) == 188
    assert all(a.n_nodes == b.n_nodes and len(a.edges) == len(b.edges)
               for a, b in zip(got, cached))


def test_max_nodes_suffix_filters_after_split():
    """`<name>_max<N>` keeps graphs with <= N nodes, applied AFTER the
    split so membership matches the unfiltered name."""
    from desco_tpu.data.datasets import load_data

    full = load_data("Syn_64_test", "data")
    cap = sorted(g.n_nodes for g in full)[len(full) // 2]
    filt = load_data(f"Syn_64_test_max{cap}", "data")
    assert all(g.n_nodes <= cap for g in filt)
    want = [g for g in full if g.n_nodes <= cap]
    assert len(filt) == len(want)
    assert all(a.n_nodes == b.n_nodes and a.n_edges == b.n_edges
               for a, b in zip(filt, want))
