"""Ablation paths: homogeneous (no hetero/tconv) pipeline and
wo-canonical whole-graph samples."""

import numpy as np
import jax
import pytest

from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.data.synthetic import generate_synthetic
from desco_tpu.data.workload import Workload
from desco_tpu.models import neighborhood as neigh_mod
from desco_tpu.models.shmp_gnn import (
    neighborhood_target_config,
    query_config,
)
from desco_tpu.pipeline import PipelineConfig, build_query_batch
from desco_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def graphs():
    return generate_synthetic(8, min_size=8, max_size=14, seed=2)


def test_homogeneous_pipeline(tmp_path, graphs):
    cfg = PipelineConfig(query_sizes=(3,), depth=3, use_hetero=False,
                         use_tconv=False, neigh_layer_num=2,
                         neigh_hidden_dim=8, neigh_epochs=2,
                         neigh_batch_size=16,
                         data_root=str(tmp_path))
    wl = Workload(graphs, root=str(tmp_path / "homo"), name="homo")
    truth = wl.compute_groundtruth(cfg.query_ids)
    samples, nindex = wl.neighborhood_samples(
        3, cfg.query_ids, use_tconv=False, use_hetero=False, truth=truth)
    # canonical-ness is in the input feature, exactly one per sample
    for s in samples[:10]:
        assert s.x.sum() == 1.0
    qb = build_query_batch(cfg)
    caps = auto_capacities(samples, g_cap=16)
    batches = pack_samples(samples, *caps, n_queries=len(cfg.query_ids))
    tgt_cfg = neighborhood_target_config(
        use_hetero=False, layer_num=2, hidden_dim=8, output_dim=8)
    qry_cfg = query_config(use_tconv=False, layer_num=2, hidden_dim=8,
                           output_dim=8)
    params = neigh_mod.init_neighborhood_model(jax.random.PRNGKey(0),
                                               tgt_cfg, qry_cfg)
    res = train_loop.train_neighborhood(
        params, tgt_cfg, qry_cfg, qb, batches, batches, epochs=2,
        lr=1e-3, log_fn=lambda *_: None)
    assert np.isfinite(res.train_losses[-1])


def test_wo_canonical_samples(tmp_path, graphs):
    wl = Workload(graphs, root=str(tmp_path / "woc"), name="woc")
    qids = [6, 7]
    truth = wl.compute_groundtruth(qids)
    samples = wl.wo_canonical_samples(qids, truth=truth)
    assert len(samples) == len(graphs)
    # labels are raw graphlet counts == column sums of canonical truth
    graphlet = wl.aggregate_node_counts(truth)
    for gid, s in enumerate(samples):
        np.testing.assert_allclose(s.y, graphlet[gid].astype(np.float32))
        assert s.n_nodes == graphs[gid].n_nodes
        # single node type (union_node)
        assert np.all(s.node_type == 0)
