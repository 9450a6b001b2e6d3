"""CountingService: load-once serving front end (desco_tpu/serving.py).

Exactness vs the raw pipeline calls, capacity pinning across requests,
and config rehydration from the checkpoint blob."""

import dataclasses

import numpy as np
import jax
import pytest

from desco_tpu.data.synthetic import generate_synthetic
from desco_tpu.models import neighborhood as neigh_mod
from desco_tpu.models.gossip import init_gossip_model
from desco_tpu.pipeline import (
    PipelineConfig,
    model_configs,
    neighborhood_predictions,
    build_query_batch,
    prepare_stage_data,
)
from desco_tpu.serving import CountingService
from desco_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """Random-init (untrained) checkpoints: serving plumbing is exact
    regardless of the weights."""
    root = tmp_path_factory.mktemp("svc_ckpt")
    cfg = PipelineConfig(neigh_layer_num=2, neigh_hidden_dim=16,
                         gossip_layer_num=1, gossip_hidden_dim=8,
                         depth=2, verify_budget=0.02,
                         data_root=str(root / "data"))
    tgt, qry = model_configs(cfg)
    params = neigh_mod.init_neighborhood_model(jax.random.PRNGKey(0),
                                               tgt, qry)
    gparams = init_gossip_model(jax.random.PRNGKey(1), input_dim=1,
                                hidden_dim=cfg.gossip_hidden_dim,
                                emb_channels=cfg.neigh_hidden_dim,
                                layer_num=cfg.gossip_layer_num)
    np_path = str(root / "neigh")
    gp_path = str(root / "gossip")
    save_checkpoint(np_path, params, config=dataclasses.asdict(cfg))
    save_checkpoint(gp_path, gparams, config=dataclasses.asdict(cfg))
    return np_path, gp_path, cfg


def test_service_matches_raw_pipeline(ckpts):
    np_path, gp_path, cfg = ckpts
    graphs = generate_synthetic(6, min_size=10, max_size=25, seed=3)

    svc = CountingService(np_path, gp_path)
    # config rehydrated from the checkpoint blob
    assert svc.cfg.neigh_layer_num == cfg.neigh_layer_num
    assert svc.cfg.depth == cfg.depth

    res = svc.count(graphs)
    assert res.refined
    assert res.graphlet_counts.shape == (6, 29)
    assert np.all(res.graphlet_counts >= 0)
    assert res.node_counts.shape[0] == sum(g.n_nodes for g in graphs)

    # raw pipeline (the main.py tail) gives identical stage-1 counts
    stage = prepare_stage_data(cfg, graphs, "__raw__", need_truth=False)
    tgt, qry = model_configs(cfg)
    qb = build_query_batch(cfg)
    raw_counts, raw_verified = neighborhood_predictions(
        svc.neigh_params, tgt, qry, qb, stage, cfg, return_verified=True)
    np.testing.assert_allclose(res.neighborhood_counts, raw_counts,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(res.verified_rows, raw_verified)


def test_service_unrefined_scatter(ckpts):
    np_path, _, _ = ckpts
    graphs = generate_synthetic(4, min_size=8, max_size=20, seed=9)
    svc = CountingService(np_path)  # no gossip checkpoint
    res = svc.count(graphs)
    assert not res.refined
    # graph aggregation == sum of node rows per graph
    offs = np.concatenate([[0], np.cumsum([g.n_nodes for g in graphs])])
    for gi in range(len(graphs)):
        np.testing.assert_allclose(
            np.round(np.maximum(
                res.node_counts[offs[gi]:offs[gi + 1]].sum(0), 0)),
            res.graphlet_counts[gi], atol=1e-6)
    with pytest.raises(ValueError):
        svc.count(graphs, refine=True)


def test_count_stream_matches_count(ckpts):
    """Pipelined streaming (host prefetch thread) is bit-identical to
    per-request count() and preserves request order."""
    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)
    reqs = [generate_synthetic(3, min_size=10, max_size=20, seed=s)
            for s in (11, 12, 13)]
    streamed = list(svc.count_stream(reqs, prefetch=2))
    assert len(streamed) == 3
    for req, got in zip(reqs, streamed):
        want = svc.count(req)
        np.testing.assert_array_equal(got.graphlet_counts,
                                      want.graphlet_counts)
        np.testing.assert_allclose(got.node_counts, want.node_counts,
                                   rtol=1e-6, atol=1e-8)

    # producer exceptions surface at the consumer
    def bad():
        yield reqs[0]
        raise RuntimeError("upstream died")
    it = svc.count_stream(bad())
    next(it)
    with pytest.raises(RuntimeError, match="upstream died"):
        next(it)


def test_service_dp_mesh_exactness(ckpts):
    """n_devices=8 serving (DP shard_map over the data axis) returns
    exactly what single-device serving returns."""
    np_path, gp_path, _ = ckpts
    graphs = generate_synthetic(10, min_size=10, max_size=24, seed=21)
    svc1 = CountingService(np_path, gp_path)
    svc8 = CountingService(np_path, gp_path, n_devices=8)
    r1 = svc1.count(graphs)
    r8 = svc8.count(graphs)
    np.testing.assert_array_equal(r1.graphlet_counts, r8.graphlet_counts)
    np.testing.assert_allclose(r1.node_counts, r8.node_counts,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(r1.verified_rows, r8.verified_rows)


def test_count_large_graph_matches_count(ckpts):
    """Halo-sharded single-graph serving == the packed-batch path on a
    graph small enough to run both ways (halo parity family)."""
    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)
    [g] = generate_synthetic(1, min_size=55, max_size=60, seed=33)

    want = svc.count([g])
    got = svc.count_large_graph(g, n_devices=4)
    assert got.refined
    np.testing.assert_allclose(got.node_counts, want.node_counts,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got.graphlet_counts, want.graphlet_counts,
                               atol=1.0)  # rounding at eps boundaries

    # unrefined path shares the packaging
    got_u = svc.count_large_graph(g, refine=False)
    want_u = svc.count([g], refine=False)
    np.testing.assert_array_equal(got_u.graphlet_counts,
                                  want_u.graphlet_counts)


def test_service_degenerate_requests(ckpts):
    """Edgeless graphs / empty requests return zeros, refine misuse on
    the large-graph path raises early, abandoned streams reap the
    producer thread (code-review regressions)."""
    import threading

    from desco_tpu.graph import Graph

    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)

    # edgeless graph: every neighborhood is dropped -> all-zero counts
    g0 = Graph(5, np.zeros((0, 2), np.int32))
    res = svc.count([g0])
    assert res.graphlet_counts.shape == (1, 29)
    assert not res.graphlet_counts.any()
    assert res.node_counts.shape == (5, 29)
    # empty request
    res = svc.count([])
    assert res.graphlet_counts.shape == (0, 29)

    # refine guard on the halo path (count already had it)
    svc_n = CountingService(np_path)
    with pytest.raises(ValueError, match="gossip"):
        svc_n.count_large_graph(g0, refine=True)
    with pytest.raises(ValueError, match="gossip"):
        svc_n.count_stream([[g0]], refine=True)  # raises at CALL time

    # abandoning a stream mid-way stops and joins the producer
    before = threading.active_count()
    reqs = [generate_synthetic(2, min_size=8, max_size=14, seed=s)
            for s in range(6)]
    for res in svc.count_stream(reqs, prefetch=2):
        break  # consumer walks away
    deadline = 50
    while threading.active_count() > before and deadline:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_serve_daemon_protocol(ckpts):
    """serve.py line-JSON protocol: ordered responses, error isolation,
    refine routing (drives handle/serve_lines in-process)."""
    import io
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import serve as serve_cli

    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)
    reqs = [
        json.dumps({"id": 1, "graphs": [
            {"n": 4, "edges": [[0, 1], [1, 2], [2, 0], [2, 3]]}]}),
        "garbage line",
        json.dumps({"id": 3, "graphs": [
            {"n": 3, "edges": [[0, 1], [1, 2]]}], "refine": False,
            "node_counts": True}),
        "quit",
        json.dumps({"id": 99, "graphs": []}),  # after quit: ignored
    ]
    out = io.StringIO()
    serve_cli.serve_lines(svc, iter(r + "\n" for r in reqs), out,
                          large_threshold=5000)
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert [r.get("id") for r in lines] == [1, None, 3]
    assert lines[0]["refined"] is True
    assert len(lines[0]["graphlet_counts"][0]) == 29
    assert "error" in lines[1]
    assert lines[2]["refined"] is False
    assert len(lines[2]["node_counts"]) == 3


def test_serve_daemon_large_routing(ckpts):
    """Single graphs >= large_threshold route to count_large_graph."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import serve as serve_cli

    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)
    calls = []
    orig = svc.count_large_graph
    svc.count_large_graph = lambda g, refine=None: (
        calls.append(g.n_nodes) or orig(g, n_devices=2, refine=refine))
    [g] = generate_synthetic(1, min_size=25, max_size=30, seed=2)
    req = {"graphs": [{"n": g.n_nodes, "edges": g.edges.tolist()}]}
    out = serve_cli.handle(svc, req, large_threshold=10)
    assert calls == [g.n_nodes]
    assert out["refined"] is True
    # below threshold, or multi-graph: the packed path
    calls.clear()
    serve_cli.handle(svc, req, large_threshold=10_000)
    serve_cli.handle(svc, {"graphs": req["graphs"] * 2},
                     large_threshold=10)
    assert calls == []


def test_serve_daemon_tcp(ckpts):
    """serve.py --tcp: line-JSON over a real socket round-trips."""
    import json
    import socket
    import sys
    import threading

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import serve as serve_cli

    np_path, _, _ = ckpts
    svc = CountingService(np_path)
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def accept_one():
        conn, _ = srv.accept()
        with conn, conn.makefile("r") as rf, conn.makefile("w") as wf:
            serve_cli.serve_lines(svc, rf, wf, large_threshold=5000)

    t = threading.Thread(target=accept_one, daemon=True)
    t.start()
    with socket.create_connection(("127.0.0.1", port), timeout=30) as c:
        f_in, f_out = c.makefile("r"), c.makefile("w")
        f_out.write(json.dumps({"id": 5, "graphs": [
            {"n": 3, "edges": [[0, 1], [1, 2], [2, 0]]}]}) + "\n")
        f_out.write("quit\n")
        f_out.flush()
        resp = json.loads(f_in.readline())
    t.join(timeout=30)
    srv.close()
    assert resp["id"] == 5
    assert len(resp["graphlet_counts"][0]) == 29


def test_service_capacity_buckets(ckpts):
    np_path, gp_path, _ = ckpts
    svc = CountingService(np_path, gp_path)
    a = generate_synthetic(3, min_size=10, max_size=18, seed=1)
    b = generate_synthetic(3, min_size=10, max_size=18, seed=2)

    r1 = svc.count(a)
    buckets1 = dict(svc._neigh_buckets)
    assert len(buckets1) == 1
    r2 = svc.count(b)  # same-size regime -> same bucket, caps unchanged
    assert svc._neigh_buckets == buckets1
    [(g_key, caps)] = buckets1.items()
    assert caps[2] == g_key  # slot count pinned at the bucket key

    # a much larger request lands in its own bucket; small bucket intact
    big = generate_synthetic(2, min_size=120, max_size=150, seed=4)
    r3 = svc.count(big)
    assert r3.graphlet_counts.shape == (2, 29)
    assert svc._neigh_buckets[g_key] == caps
    assert len(svc._neigh_buckets) == 2
    big_key = max(svc._neigh_buckets)
    assert svc._neigh_buckets[big_key][0] > caps[0]  # bigger n_cap

    # single-graph convenience == batch row, served from a small bucket
    single = svc.count_graph(a[0])
    np.testing.assert_allclose(single, svc.count([a[0]]).graphlet_counts[0])
    assert min(svc._neigh_buckets) <= g_key
    assert r1.graphlet_counts.shape == (3, 29)
    assert r2.graphlet_counts.shape == (3, 29)


def test_service_checkpoint_ensemble(ckpts):
    """A list of checkpoint paths serves the ensemble: a singleton list
    is identical to the single-path service, and a two-member ensemble
    of DIFFERENT weights still runs the full pipeline and differs from
    either member (the log-space mean is exactness-tested at the
    pipeline layer, test_pipeline.py)."""
    np_path, gp_path, cfg = ckpts
    graphs = generate_synthetic(4, min_size=10, max_size=20, seed=9)

    solo = CountingService(np_path, gp_path).count(graphs)
    single = CountingService([np_path], gp_path).count(graphs)
    np.testing.assert_array_equal(single.graphlet_counts,
                                  solo.graphlet_counts)

    # second member: different weights under the same config
    tgt, qry = model_configs(cfg)
    p2 = neigh_mod.init_neighborhood_model(jax.random.PRNGKey(42),
                                           tgt, qry)
    np2_path = np_path + "_m2"
    save_checkpoint(np2_path, p2, config=dataclasses.asdict(cfg))
    ens = CountingService([np_path, np2_path], gp_path).count(graphs)
    assert ens.graphlet_counts.shape == solo.graphlet_counts.shape
    assert not np.array_equal(ens.graphlet_counts, solo.graphlet_counts)
