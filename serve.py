"""desco_tpu serving daemon: graphs in, graphlet counts out.

A thin process front for ``desco_tpu.serving.CountingService`` so
non-Python clients can count subgraphs without re-running the training
driver (the reference has no serving entry at all — its inference is the
tail of main.py, re-run per dataset).

Protocol: line-delimited JSON. One request per line:

    {"id": 7, "graphs": [{"n": 5, "edges": [[0,1],[1,2],[3,4]]}, ...],
     "refine": true, "node_counts": false}

One response line per request, in order:

    {"id": 7, "graphlet_counts": [[...29 floats...], ...],
     "verified": 3}

Graphs with >= --large_threshold nodes are served via the halo-sharded
single-graph path (no device holds the whole graph). Errors come back as
{"id": ..., "error": "..."} without killing the daemon.

Usage:
  python serve.py --neigh_ckpt ckpt/full5/neigh.best \
      --gossip_ckpt ckpt/full5/gossip.best            # stdin/stdout
  python serve.py ... --tcp 127.0.0.1:8345            # line-JSON TCP
"""

from __future__ import annotations

import argparse
import json
import sys


def build_service(args):
    from desco_tpu.serving import CountingService

    overrides = {}
    if args.verify_budget is not None:
        overrides["verify_budget"] = args.verify_budget
    if args.bf16:
        overrides["serve_bf16"] = True
    if args.exact_size:
        overrides["exact_size"] = args.exact_size
    return CountingService(
        args.neigh_ckpt, args.gossip_ckpt,
        config_overrides=overrides or None,
        n_devices=args.n_devices,
        compile_cache=args.compile_cache)


def handle(svc, req: dict, large_threshold: int) -> dict:
    import numpy as np

    from desco_tpu.graph import Graph

    graphs = [
        Graph(int(g["n"]), np.asarray(g.get("edges", []), np.int32))
        for g in req["graphs"]
    ]
    refine = req.get("refine")
    if (len(graphs) == 1 and graphs[0].n_nodes >= large_threshold):
        res = svc.count_large_graph(graphs[0], refine=refine)
    else:
        res = svc.count(graphs, refine=refine)
    out = {
        "id": req.get("id"),
        "graphlet_counts": res.graphlet_counts.tolist(),
        "refined": res.refined,
        "verified": int(len(res.verified_rows)),
    }
    if req.get("node_counts"):
        out["node_counts"] = res.node_counts.tolist()
    return out


def serve_lines(svc, rfile, wfile, large_threshold: int) -> None:
    for line in rfile:
        line = line.strip()
        if not line:
            continue
        if line in ("quit", "exit"):
            break
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id")
            out = handle(svc, req, large_threshold)
        except Exception as e:  # daemon survives bad requests
            out = {"id": rid, "error": f"{type(e).__name__}: {e}"}
        wfile.write(json.dumps(out) + "\n")
        wfile.flush()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    # several paths serve their ensemble (CountingService docs)
    ap.add_argument("--neigh_ckpt", required=True, nargs="+")
    ap.add_argument("--gossip_ckpt", default=None)
    ap.add_argument("--n_devices", type=int, default=1,
                    help=">1: DP-shard forwards over a data mesh axis")
    ap.add_argument("--large_threshold", type=int, default=5000,
                    help="single graphs >= this go through the "
                         "halo-sharded path")
    ap.add_argument("--verify_budget", type=float, default=None)
    ap.add_argument("--exact_size", type=int, default=0,
                    help="serve queries with <= N nodes exactly")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tcp", default=None, metavar="HOST:PORT",
                    help="serve line-JSON over TCP instead of stdio")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--compile_cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache directory; "
                         "restarts reload compiled executables instead "
                         "of recompiling (cold start is "
                         "compile-dominated)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    svc = build_service(args)
    print("ready", file=sys.stderr, flush=True)

    if args.tcp:
        import socket

        host, port = args.tcp.rsplit(":", 1)
        srv = socket.create_server((host, int(port)))
        print(f"listening on {args.tcp}", file=sys.stderr, flush=True)
        while True:
            conn, _ = srv.accept()
            with conn, conn.makefile("r") as rf, conn.makefile("w") as wf:
                serve_lines(svc, rf, wf, args.large_threshold)
    else:
        serve_lines(svc, sys.stdin, sys.stdout, args.large_threshold)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
