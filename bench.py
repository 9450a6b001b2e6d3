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

The JSON line also anchors the number to a speed-of-light roofline
(BASELINE.json: "SpMM at speed-of-light per chip"):

  * ``bytes_per_edge_layer`` — the minimum HBM traffic the shipped
    kernel path must move per edge slot per layer (static model, see
    ``_roofline_bytes``), with per-node terms amortized over edges;
  * ``sol_fraction`` — modeled_traffic / elapsed / HBM_BW: the fraction
    of the chip's HBM bandwidth the forward sustains under that model.
    The MXU term is never the binder here (65.5 kFLOP/edge-slot on a
    ~197 TFLOP/s bf16 chip -> ~3.0G edge-slots/s compute ceiling, ~20x
    above the bandwidth ceiling), so HBM is the roofline that matters.
  * ``graphs_per_s`` — whole-neighborhood inference rate of the same
    forward (BASELINE.json names both metrics).

HBM bandwidth defaults to TPU v5e's 819 GB/s; override with
DESCO_HBM_GBPS for other chips.
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


def _roofline_bytes(n_cap: int, e_cap: int, n_types: int, h: int,
                    layers: int, lanes: int = 128,
                    seg_tile: int = 1024) -> int:
    """Minimum HBM traffic (bytes) of the target tower's ``layers``
    typed-aggregation layers on the shipped kernel path
    (ops/pallas_segment.py), per forward:

    per layer
      edge terms (per edge SLOT — padding streams through the DMA too):
        zp gather read (lanes x bf16) + msgs write (lanes x bf16) +
        kernel msgs read (lanes x bf16) + gather idx (i32) + seg (i32)
      node terms:
        x read for the transform einsum (h x f32), zp write
        (n_types x lanes x bf16), kernel accumulator write
        (seg_tile-padded, lanes x f32), update-linear reads
        (agg h x f32 + x h x f32) and write (h x f32).

    Deliberately EXCLUDES the query tower (hoisted, runs once per query
    set), the count head, and pre/post MLPs — a lower bound, so the
    reported sol_fraction is conservative."""
    n_pad = ((n_cap + seg_tile - 1) // seg_tile) * seg_tile
    edge = e_cap * (3 * lanes * 2 + 4 + 4)
    node = (n_cap * h * 4                 # x read (transform)
            + n_types * n_cap * lanes * 2  # zp write (bf16)
            + n_pad * lanes * 4            # kernel out write (f32)
            + n_cap * (lanes * 4           # agg read (update linear)
                       + h * 4 + h * 4))   # x read + x write
    return layers * (edge + node)


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

    # roofline anchor: modeled minimum HBM traffic vs chip bandwidth
    n_cap = int(np.asarray(batch.x).shape[0])
    e_cap = int(np.asarray(batch.edge_src).shape[0])
    model_bytes = _roofline_bytes(n_cap, e_cap, tgt_cfg.n_edge_types,
                                  64, 8)
    hbm_bw = float(os.environ.get("DESCO_HBM_GBPS", "819")) * 1e9
    per_fwd = dt / n_iters
    sol = model_bytes / per_fwd / hbm_bw

    # ---- one full jitted TRAIN step (fwd + bwd + adam), same workload.
    # The training loss needs labels; the bench batch carries none, so
    # attach synthetic integer counts (shape/dtype of the real path).
    # Training is ALWAYS f32 (DESCO_DTYPE=bfloat16 benches the bf16
    # SERVING tower only — --serve_bf16 semantics), so the train step
    # uses an f32 config regardless of the forward's dtype.
    import dataclasses

    from desco_tpu.train.loop import make_adam, neighborhood_step_fn

    train_cfg = (tgt_cfg if dtype == jnp.float32 else
                 neighborhood_target_config(
                     layer_num=8, hidden_dim=64, output_dim=64,
                     agg_mode=agg_mode))
    train_params = (params if dtype == jnp.float32 else
                    jax.device_put(neigh_mod.init_neighborhood_model(
                        jax.random.PRNGKey(0), train_cfg, qry_cfg)))
    rng_np = np.random.default_rng(0)
    tb = dataclasses.replace(
        batch, y=jnp.asarray(rng_np.integers(0, 50, (batch.g_cap, 29)),
                             jnp.float32))
    tb = jax.device_put(tb)
    tx = make_adam(0.0)
    step = jax.jit(neighborhood_step_fn(train_cfg, qry_cfg, qb, tx),
                   donate_argnums=(0, 1))
    opt_state = tx.init(train_params)
    lr = jnp.float32(1e-4)
    rng = jax.random.PRNGKey(1)
    p, o, loss = step(train_params, opt_state, tb, lr, rng)
    _ = float(loss)  # compile + completion
    t0 = time.perf_counter()
    n_train_iters = max(10, n_iters // 4)
    for _ in range(n_train_iters):
        p, o, loss = step(p, o, tb, lr, rng)
    _ = float(loss)
    train_dt = time.perf_counter() - t0
    train_edges_per_s = valid_edges * n_train_iters / train_dt

    print(json.dumps({
        "metric": "shmp_neighborhood_forward_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / base, 4),
        "graphs_per_s": round(graphs_per_s, 1),
        "bytes_per_edge_layer": round(model_bytes / 8 / valid_edges, 1),
        "sol_fraction": round(sol, 4),
        "hbm_gbps_assumed": hbm_bw / 1e9,
        "train_edges_per_s": round(train_edges_per_s, 1),
        "train_step_ms": round(train_dt / n_train_iters * 1e3, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
