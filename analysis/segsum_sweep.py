"""Sweep the Pallas segment-sum tile parameters on real hardware.

Times the full 8-layer SHMP core (forward, and optionally value+grad)
on the bench.py workload for each (seg_tile, ce, gsz) triple, by
overriding the module constants in desco_tpu.ops.pallas_segment. The
winner becomes the shipped default (SEG_TILE/CE/GSZ).

Usage: python analysis/segsum_sweep.py [--grad] [--triples 1024,512,512 ...]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DEFAULT_TRIPLES = [
    (1024, 512, 512),    # shipped default
    (1024, 1024, 512),
    (1024, 1024, 1024),
    (1024, 512, 256),
    (2048, 512, 512),
    (2048, 1024, 512),
    (512, 512, 512),
    (1024, 2048, 512),
    (1024, 2048, 1024),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--triples", nargs="*", default=None,
                    help="seg_tile,ce,gsz triples")
    args = ap.parse_args()
    triples = (DEFAULT_TRIPLES if not args.triples else
               [tuple(int(x) for x in t.split(",")) for t in args.triples])

    import jax

    from bench import build_workload
    from desco_tpu.models.shmp_gnn import (
        apply_shmp_core, init_shmp, neighborhood_target_config,
    )
    from desco_tpu.ops import pallas_segment as ps

    batch, _ = build_workload()
    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    print(f"workload: n_cap={batch.n_cap} e_cap={batch.e_cap} "
          f"valid_edges={valid_edges}")

    cfg = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                     output_dim=64, agg_mode="pallas")
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    def timeit(fn, *a):
        out = fn(*a)
        _ = jax.tree_util.tree_map(np.asarray, out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        _ = jax.tree_util.tree_map(np.asarray, out)
        per = (time.perf_counter() - t0) / 5
        iters = max(10, int(0.6 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _ = jax.tree_util.tree_map(np.asarray, out)
            reps.append((time.perf_counter() - t0) / iters)
        return sorted(reps)[1]

    for (st, ce, gsz) in triples:
        if gsz % 128 or ce % gsz or st < 256:
            print(f"({st},{ce},{gsz}): invalid, skipped")
            continue
        ps.SEG_TILE, ps.CE, ps.GSZ = st, ce, gsz
        fwd = jax.jit(lambda p, b: apply_shmp_core(p, cfg, b).sum())
        try:
            dt = timeit(fwd, params, batch)
        except Exception as e:  # noqa: BLE001
            print(f"({st},{ce},{gsz}): FAILED ({type(e).__name__})")
            continue
        line = (f"({st:5d},{ce:5d},{gsz:5d}): {dt * 1e3:7.2f} ms/fwd  "
                f"{valid_edges * 8 / dt / 1e6:7.1f}M edge-layers/s")
        if args.grad:
            loss = jax.jit(jax.value_and_grad(
                lambda p, b: (apply_shmp_core(p, cfg, b) ** 2).sum()))
            dtg = timeit(loss, params, batch)
            line += f"   {dtg * 1e3:7.2f} ms/val+grad"
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
