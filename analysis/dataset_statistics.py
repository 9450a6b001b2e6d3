"""Dataset statistics: per-graph tables, per-NEIGHBORHOOD structural
features, a t-SNE projection figure, and (beyond the reference) a
trained-embedding projection.

Full-scope counterpart of the reference's analysis/dataset_statistics.py
(343 LoC): that notebook-style script builds, for every dataset, the
depth-d canonical neighborhoods, computes seven structural features per
neighborhood (largest connected component: nodes, edges, avg degree,
clustering, avg shortest path, diameter, density — reference lines
225-265), prints describe() tables, writes a features CSV, and projects
the feature matrix with t-SNE colored by dataset (lines 290-343).

This tool reproduces all of that on the flat-array host pipeline (no
networkx on the hot path) and adds an optional ``--checkpoint`` mode
that embeds every neighborhood with a TRAINED SHMP tower and projects
the learned embedding space instead of hand-crafted features — the
view the reference's commented-out first half gestures at.

Usage:
  python analysis/dataset_statistics.py --datasets Syn_64 ChemProxy \
      [--depth 4] [--sample 2000] [--out output/stats] \
      [--checkpoint release/r4/neigh.best] [--projection tsne|pca]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FEATS = ["num_nodes", "num_edges", "avg_degree", "clustering",
         "shortest_path_length", "diameter", "density"]


def _neigh_features(g) -> dict:
    """Seven structural features of one neighborhood graph's largest
    connected component (reference dataset_statistics.py:241-254).
    BFS-based, flat arrays; graphs here are <= a few hundred nodes."""
    indptr, indices = g.csr()
    n = g.n_nodes
    # largest connected component via BFS sweep
    comp = np.full(n, -1, np.int64)
    c = 0
    for s in range(n):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = c
        while stack:
            v = stack.pop()
            for u in indices[indptr[v]:indptr[v + 1]]:
                if comp[u] < 0:
                    comp[u] = c
                    stack.append(int(u))
        c += 1
    sizes = np.bincount(comp)
    keep = int(np.argmax(sizes))
    nodes = np.nonzero(comp == keep)[0]
    nset = set(nodes.tolist())
    nn = len(nodes)
    deg = np.array([
        sum(1 for u in indices[indptr[v]:indptr[v + 1]] if int(u) in nset)
        for v in nodes], float)
    ne = int(deg.sum()) // 2

    # clustering coefficient (exact, sorted-adjacency intersection)
    cl = []
    adj = {int(v): set(int(u) for u in indices[indptr[v]:indptr[v + 1]]
                       if int(u) in nset) for v in nodes}
    for v in nodes:
        nb = adj[int(v)]
        k = len(nb)
        if k < 2:
            cl.append(0.0)
            continue
        links = sum(len(adj[u] & nb) for u in nb) // 2
        cl.append(2.0 * links / (k * (k - 1)))

    # all-pairs BFS for avg shortest path + diameter
    total, cnt, diam = 0, 0, 0
    order = {int(v): i for i, v in enumerate(nodes)}
    for v in nodes:
        dist = {int(v): 0}
        frontier = [int(v)]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for w in frontier:
                for u in adj[w]:
                    if u not in dist:
                        dist[u] = d
                        nxt.append(u)
            frontier = nxt
        for u, du in dist.items():
            if order[u] > order[int(v)]:
                total += du
                cnt += 1
                diam = max(diam, du)
    return {
        "num_nodes": nn,
        "num_edges": ne,
        "avg_degree": float(deg.mean()) if nn else 0.0,
        "clustering": float(np.mean(cl)) if cl else 0.0,
        "shortest_path_length": total / cnt if cnt else 0.0,
        "diameter": diam,
        "density": 2.0 * ne / (nn * (nn - 1)) if nn > 1 else 0.0,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", type=str, nargs="+", default=["Syn_64"])
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--sample", type=int, default=2000,
                   help="neighborhoods sampled per dataset (fixed seed)")
    p.add_argument("--out", type=str, default="output/stats")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="SHMP checkpoint: also project TRAINED "
                        "neighborhood embeddings")
    p.add_argument("--projection", choices=["tsne", "pca"],
                   default="tsne")
    args = p.parse_args()

    # honor JAX_PLATFORMS=cpu (the container registers the TPU plugin at
    # interpreter start, so the env var alone is too late — same guard
    # as __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from desco_tpu.data.datasets import load_data
    from desco_tpu.graph.canonical import extract_all_neighborhoods

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)

    # ---- per-GRAPH summary table (the quick view)
    graph_rows, feat_rows, neighs_by_ds = [], [], {}
    for name in args.datasets:
        graphs = load_data(name, args.data_root)
        nodes = np.array([g.n_nodes for g in graphs])
        edges = np.array([g.n_edges for g in graphs])
        degs = np.concatenate([g.degrees() for g in graphs])
        graph_rows.append({
            "dataset": name, "graphs": len(graphs),
            "nodes_mean": float(nodes.mean()), "nodes_max": int(nodes.max()),
            "edges_mean": float(edges.mean()), "edges_max": int(edges.max()),
            "degree_mean": float(degs.mean()), "degree_max": int(degs.max()),
        })
        print("  ".join(f"{k}={v}" for k, v in graph_rows[-1].items()))

        # ---- per-NEIGHBORHOOD structural features (sampled)
        neighs, _, _ = extract_all_neighborhoods(graphs, depth=args.depth)
        idx = rng.permutation(len(neighs))[:args.sample]
        neighs_by_ds[name] = [neighs[i] for i in idx]
        for nb in neighs_by_ds[name]:
            row = _neigh_features(nb.graph if hasattr(nb, "graph") else nb)
            row["dataset"] = name
            feat_rows.append(row)

    import csv

    with open(os.path.join(args.out, "graph_stats.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(graph_rows[0].keys()))
        w.writeheader()
        w.writerows(graph_rows)
    with open(os.path.join(args.out, "neighborhood_features.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=["dataset"] + FEATS)
        w.writeheader()
        w.writerows(feat_rows)

    # describe() per dataset (reference lines 280-287)
    for name in args.datasets:
        sel = [r for r in feat_rows if r["dataset"] == name]
        print(f"\n{name}: {len(sel)} neighborhoods")
        for ft in FEATS:
            v = np.array([r[ft] for r in sel], float)
            print(f"  {ft:22s} mean {v.mean():9.3f}  std {v.std():9.3f}"
                  f"  min {v.min():8.3f}  max {v.max():8.3f}")

    # ---- projection figure over structural features
    X = np.array([[r[ft] for ft in FEATS] for r in feat_rows], float)
    labels = [r["dataset"] for r in feat_rows]
    Xn = (X - X.mean(0)) / np.maximum(X.std(0), 1e-9)
    _project_and_plot(Xn, labels, args, "neighborhood_features")

    # ---- trained-embedding projection (beyond the reference)
    if args.checkpoint:
        emb, elabels = _trained_embeddings(args, neighs_by_ds)
        _project_and_plot(emb, elabels, args, "trained_embeddings")
    return 0


def _pca2(X):
    """2-D PCA projection that degrades gracefully for tiny inputs:
    sklearn requires n_components <= min(n_samples, n_features), so a
    1-sample set (e.g. --sample 1) pads missing components with zeros
    instead of raising."""
    from sklearn.decomposition import PCA

    nc = min(2, len(X), X.shape[1])
    if nc < 1:
        return np.zeros((len(X), 2))
    p = PCA(n_components=nc, random_state=0).fit_transform(X)
    if p.shape[1] < 2:
        p = np.concatenate([p, np.zeros((len(p), 2 - p.shape[1]))], 1)
    return p


def _project_and_plot(X, labels, args, tag):
    if args.projection == "tsne":
        from sklearn.manifold import TSNE

        # reference: perplexity 40, 300 iters (line 290); clamp to
        # [2, n-1) so tiny --sample values don't crash sklearn
        perp = max(2, min(40, (len(X) - 1) // 4))
        if len(X) <= perp + 1:
            proj = _pca2(X)
        else:
            proj = TSNE(n_components=2, perplexity=perp,
                        max_iter=300, init="pca",
                        random_state=0).fit_transform(X)
    else:
        proj = _pca2(X)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = plt.figure(figsize=(10, 7))
    names = sorted(set(labels))
    cmap = plt.get_cmap("tab10")
    lab = np.array(labels)
    for i, name in enumerate(names):
        m = lab == name
        plt.scatter(proj[m, 0], proj[m, 1], s=6, alpha=0.5,
                    color=cmap(i % 10), label=name)
    plt.legend(markerscale=3)
    plt.title(f"{args.projection} of {tag}")
    path = os.path.join(args.out, f"{args.projection}_{tag}.png")
    plt.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(f)
    np.save(os.path.join(args.out, f"{args.projection}_{tag}.npy"), proj)
    print(f"wrote {path}")


def _trained_embeddings(args, neighs_by_ds):
    """Embed sampled neighborhoods with a trained SHMP tower (pooled
    pre-count-head embedding), batched through the packed pipeline."""
    import json

    import jax

    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.pipeline import (
        PipelineConfig, apply_degree_feature, model_configs)
    from desco_tpu.train.checkpoint import load_checkpoint

    # rehydrate the model config from the checkpoint's JSON blob
    import dataclasses

    with open(args.checkpoint + ".json") as f:
        meta = json.load(f)
    fields = {f.name for f in dataclasses.fields(PipelineConfig)}
    raw = {k: v for k, v in (meta.get("config") or {}).items()
           if k in fields}
    if "query_sizes" in raw:
        raw["query_sizes"] = tuple(raw["query_sizes"])
    cfg = PipelineConfig(**raw)
    tgt_cfg, qry_cfg = model_configs(cfg)
    template = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
    params, _, _ = load_checkpoint(args.checkpoint, template)

    from desco_tpu.batch.build import homogeneous_neighborhood_sample

    fn = None
    out, labels = [], []
    for name, neighs in neighs_by_ds.items():
        # mirror prepare_stage_data: the checkpoint's hetero/tconv/order/
        # f_dim/node-feature/degree-feature settings decide the edge
        # typing and features — defaults here would silently mis-embed
        # non-default checkpoints (a --no-use_hetero checkpoint has one
        # conv type; hetero typing would index out of its weight table)
        def one_sample(nb):
            if not cfg.use_hetero:
                return homogeneous_neighborhood_sample(nb)
            # induced_subgraph carries node_feat through in local order
            feat = nb.graph.node_feat if cfg.use_node_feature else None
            return neighborhood_sample(nb, use_tconv=cfg.use_tconv,
                                       f_dim=cfg.neigh_input_dim,
                                       x=feat, order=cfg.order)

        samples = [one_sample(nb) for nb in neighs]
        if cfg.degree_feature:
            apply_degree_feature(samples)
        caps = auto_capacities(samples, g_cap=256)
        batches = pack_samples(samples, *caps)
        if fn is None:
            fn = jax.jit(lambda p, b: neigh_mod.embed_targets(
                p, tgt_cfg, b))
        for b in batches:
            emb = np.asarray(fn(params, jax.device_put(b)))
            valid = np.asarray(b.graph_mask) > 0
            out.append(emb[valid])
            labels += [name] * int(valid.sum())
    return np.concatenate(out, 0), labels


if __name__ == "__main__":
    sys.exit(main())
