"""Runtime probe: time the neighborhood embedding forward on a dataset.

Counterpart of the reference's analysis/runtime.py:34-70 (CUDA-event
timing of emb_model over DD, batch 32, 10 reps) — here with proper device
synchronization on TPU and edges/s reporting, plus an optional
jax.profiler trace.

Usage: python analysis/runtime.py --dataset Syn_64 [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="Syn_64")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--trace", type=str, default=None,
                   help="jax.profiler trace output dir")
    args = p.parse_args()

    import jax
    import numpy as np

    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload
    from desco_tpu.models.shmp_gnn import (
        apply_shmp, neighborhood_target_config,
    )
    from desco_tpu.models.shmp_gnn import init_shmp

    graphs = load_data(args.dataset, args.data_root)
    wl = Workload(graphs, root=f"{args.data_root}/{args.dataset}",
                  name=args.dataset)
    samples, _ = wl.neighborhood_samples(
        args.depth, [6, 7], truth=np.zeros((wl.total_nodes, 2)))
    caps = auto_capacities(samples, g_cap=args.batch_size)
    batch = pack_samples(samples, *caps, n_queries=2)[0]

    cfg = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                     output_dim=64)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(apply_shmp, static_argnums=1)
    batch = jax.device_put(batch)
    _ = np.asarray(fwd(params, cfg, batch))  # compile + real completion

    # block_until_ready returns at ENQUEUE on this platform (see
    # bench.py): every timing window must end with a host read-back, and
    # windows are batched to >= ~0.5s so the read-back round-trip
    # amortizes. args.reps forward calls per window, 3 windows, median.
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fwd(params, cfg, batch)
    _ = np.asarray(out)
    per_iter = (time.perf_counter() - t0) / args.reps
    n_iters = max(args.reps, int(0.5 / max(per_iter, 1e-6)))

    if args.trace:
        jax.profiler.start_trace(args.trace)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fwd(params, cfg, batch)
        _ = np.asarray(out)
        windows.append((time.perf_counter() - t0) / n_iters)
    if args.trace:
        jax.profiler.stop_trace()
        print(f"profile trace written to {args.trace}")

    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    t = float(np.median(windows))
    print(f"emb_model forward: median {t * 1e3:.3f} ms "
          f"({n_iters} iters/window x 3)  "
          f"({valid_edges / t / 1e6:.1f}M edges/s, "
          f"{int(np.asarray(batch.graph_mask).sum()) / t:.0f} graphs/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
