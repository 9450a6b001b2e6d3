"""Benchmark: SHMP neighborhood-model forward throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "edges/s/chip", "vs_baseline": N}

The workload is a packed batch of Syn-style canonical neighborhoods
(depth-4, 6-type tconv SHMP, 8 layers, hidden 64 — the paper config,
reference config.py:247-264) driven through the full counting forward
(embedding towers + 29-query count head). edges/s counts *valid directed
edges* processed per second of steady-state forward.

vs_baseline compares against the number recorded in bench_baseline.json
(written on first run): >1.0 means faster than the first recorded run.
The reference publishes no throughput numbers (SURVEY.md §6), so the
baseline is this repo's own first measurement on the same hardware.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def build_workload(n_graphs: int = 24, seed: int = 0, depth: int = 4):
    from desco_tpu.batch.build import neighborhood_sample, query_sample
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.data.synthetic import generate_synthetic
    from desco_tpu.graph.atlas import gen_queries, gen_query_ids
    from desco_tpu.graph.canonical import extract_all_neighborhoods

    graphs = generate_synthetic(n_graphs, min_size=30, max_size=120,
                                seed=seed)
    neighs, _, _ = extract_all_neighborhoods(graphs, depth=depth)
    n_q = 29
    samples = [neighborhood_sample(nb) for nb in neighs]
    qids = gen_query_ids([3, 4, 5])
    qs = [query_sample(q) for q in gen_queries(qids)]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))
    caps = auto_capacities(samples, g_cap=512)
    batch = pack_samples(samples, *caps, n_queries=n_q)[0]
    return batch, qb


def main() -> int:
    import jax

    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.shmp_gnn import (
        neighborhood_target_config, query_config,
    )

    from desco_tpu.ops.pallas_segment import default_agg_mode

    agg_mode = os.environ.get("DESCO_AGG_MODE", "auto")
    if agg_mode == "auto":
        agg_mode = default_agg_mode()

    import jax.numpy as jnp

    # DESCO_DTYPE=bfloat16 benches the bf16 serving tower (--serve_bf16);
    # the recorded metric stays the f32 default for baseline continuity
    dtype = {"float32": jnp.float32,
             "bfloat16": jnp.bfloat16}[os.environ.get("DESCO_DTYPE",
                                                      "float32")]
    batch, qb = build_workload()
    tgt_cfg = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                         output_dim=64, agg_mode=agg_mode,
                                         dtype=dtype)
    qry_cfg = query_config(layer_num=8, hidden_dim=64, output_dim=64)
    params = neigh_mod.init_neighborhood_model(jax.random.PRNGKey(0),
                                               tgt_cfg, qry_cfg)

    @jax.jit
    def fwd(params, batch, qb):
        return neigh_mod.predict_counts(params, tgt_cfg, qry_cfg, batch, qb)

    params = jax.device_put(params)
    batch = jax.device_put(batch)
    qb = jax.device_put(qb)

    out = fwd(params, batch, qb)
    _ = np.asarray(out)  # compile + real completion

    # warmup + calibrate to a >=1s window. CRITICAL: block_until_ready
    # returns at ENQUEUE on the axon platform — only a host read-back
    # (np.asarray) observes real completion, so every timing window ends
    # with one.
    t0 = time.perf_counter()
    for _ in range(10):
        out = fwd(params, batch, qb)
    _ = np.asarray(out)
    per_iter = (time.perf_counter() - t0) / 10
    n_iters = max(30, int(1.0 / max(per_iter, 1e-6)))

    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fwd(params, batch, qb)
        _ = np.asarray(out)
        reps.append(time.perf_counter() - t0)
    dt = sorted(reps)[1]  # median of 3

    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    valid_graphs = int(np.asarray(batch.graph_mask).sum())
    edges_per_s = valid_edges * n_iters / dt
    graphs_per_s = valid_graphs * n_iters / dt

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)["edges_per_s"]
    else:
        with open(BASELINE_PATH, "w") as f:
            json.dump({"edges_per_s": edges_per_s,
                       "graphs_per_s": graphs_per_s,
                       "device": str(jax.devices()[0])}, f, indent=2)
        base = edges_per_s

    print(json.dumps({
        "metric": "shmp_neighborhood_forward_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / base, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
