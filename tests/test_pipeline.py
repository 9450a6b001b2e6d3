"""End-to-end pipeline on a tiny synthetic dataset: both stages train,
losses decrease, predictions aggregate, metrics compute."""

import dataclasses

import jax
import numpy as np
import pytest

from desco_tpu.data.synthetic import generate_synthetic
from desco_tpu.pipeline import (
    PipelineConfig,
    build_query_batch,
    evaluate_graphlet_counts,
    model_configs,
    neighborhood_predictions,
    prepare_gossip_batches,
    prepare_stage_data,
    train_gossip_stage,
    train_neighborhood_stage,
)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    return PipelineConfig(
        query_sizes=(3,),
        depth=3,
        neigh_layer_num=2, neigh_hidden_dim=16,
        neigh_epochs=8, neigh_batch_size=32, neigh_lr=1e-3,
        gossip_layer_num=2, gossip_hidden_dim=16,
        gossip_epochs=4, gossip_batch_size=8, gossip_lr=1e-3,
        data_root=str(tmp_path_factory.mktemp("data")),
    )


@pytest.fixture(scope="module")
def tiny_data(tiny_cfg):
    graphs = generate_synthetic(16, min_size=8, max_size=16, seed=1)
    train = prepare_stage_data(tiny_cfg, graphs[:10], "tiny_train")
    val = prepare_stage_data(tiny_cfg, graphs[10:13], "tiny_val")
    test = prepare_stage_data(tiny_cfg, graphs[13:], "tiny_test")
    return train, val, test


def test_groundtruth_cache_roundtrip(tiny_cfg, tiny_data):
    train, _, _ = tiny_data
    t2 = train.workload.compute_groundtruth(tiny_cfg.query_ids)
    np.testing.assert_array_equal(t2, train.truth)


def test_full_pipeline(tiny_cfg, tiny_data, tmp_path):
    train, val, test = tiny_data
    qb = build_query_batch(tiny_cfg)

    res, tgt_cfg, qry_cfg = train_neighborhood_stage(
        tiny_cfg, train, val, qb, log_fn=lambda *_: None)
    assert res.train_losses[-1] < res.train_losses[0]
    assert np.isfinite(res.best_val)

    # stage-1 predictions for every split
    counts = {}
    for name, stage in [("train", train), ("val", val), ("test", test)]:
        c = neighborhood_predictions(res.best_params, tgt_cfg, qry_cfg, qb,
                                     stage)
        assert c.shape == (len(stage.samples), len(tiny_cfg.query_ids))
        counts[name] = c

    gossip_batches = {
        name: prepare_gossip_batches(tiny_cfg, stage, counts[name])
        for name, stage in [("train", train), ("val", val), ("test", test)]
    }
    gres, query_embs = train_gossip_stage(
        tiny_cfg, res.best_params, tgt_cfg, qry_cfg, qb,
        gossip_batches["train"], gossip_batches["val"],
        log_fn=lambda *_: None)
    assert np.isfinite(gres.train_losses[-1])

    from desco_tpu.train.loop import predict_gossip_counts

    node_counts = predict_gossip_counts(gres.best_params, query_embs,
                                        gossip_batches["test"])
    assert node_counts.shape == (test.workload.total_nodes,
                                 len(tiny_cfg.query_ids))

    metrics = evaluate_graphlet_counts(tiny_cfg, test, counts["test"],
                                       node_counts)
    for k, v in metrics.items():
        assert all(np.isfinite(x) for x in v), (k, v)


def test_checkpoint_roundtrip(tiny_cfg, tiny_data, tmp_path):
    import jax

    from desco_tpu.models.neighborhood import init_neighborhood_model
    from desco_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tgt_cfg, qry_cfg = model_configs(tiny_cfg)
    params = init_neighborhood_model(jax.random.PRNGKey(7), tgt_cfg, qry_cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params,
                    config=dataclasses.asdict(tiny_cfg))
    template = init_neighborhood_model(jax.random.PRNGKey(8), tgt_cfg,
                                       qry_cfg)
    restored, _, meta = load_checkpoint(path, template)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["config"]["depth"] == tiny_cfg.depth


def test_verify_tail_counts_exactness(tiny_cfg, tiny_data):
    """verify_tail_counts replaces the selected rows with EXACT canonical
    counts (== the stage truth) and reports exactly those rows."""
    from desco_tpu.pipeline import verify_tail_counts

    _, _, test = tiny_data
    cfg = dataclasses.replace(tiny_cfg, verify_budget=0.3)
    n = len(test.nindex.index)          # neighborhoods, not nodes
    q = test.truth.shape[1]
    rng = np.random.default_rng(0)
    fake = rng.random((n, q)).astype(np.float32) * 10.0
    fixed, rows = verify_tail_counts(np.array(fake), test, cfg)
    # flagged set = union of top-k by row total and per-column top-k
    k = int(np.ceil(0.3 * n))
    expect = set(np.argsort(-fake.sum(1))[:k])
    for c in range(q):
        expect |= set(np.argsort(-fake[:, c])[:k])
    assert set(rows) == expect
    # exact recounts == the per-node truth at each neighborhood's
    # canonical node (decomposition exactness)
    node_rows = np.nonzero(np.asarray(test.nindex.indicator))[0][rows]
    np.testing.assert_allclose(fixed[rows], test.truth[node_rows],
                               rtol=1e-6, atol=1e-6)
    untouched = np.setdiff1d(np.arange(n), rows)
    np.testing.assert_array_equal(fixed[untouched], fake[untouched])


def test_verify_tail_counts_catches_column_outlier(tiny_cfg, tiny_data):
    """A row that is huge in ONE query column but small in total must be
    flagged (the per-column union; a sum-only ranking can miss it)."""
    from desco_tpu.pipeline import verify_tail_counts

    _, _, test = tiny_data
    cfg = dataclasses.replace(tiny_cfg, verify_budget=1.0 / 1e9)  # k = 1
    n = len(test.nindex.index)
    q = test.truth.shape[1]
    if q < 2 or n < 3:
        import pytest as _pytest

        _pytest.skip("needs >=2 query columns and >=3 rows")
    fake = np.full((n, q), 5.0, np.float32)
    fake[0, 0] = 100.0          # dominates the row total (via column 0)
    fake[1, 1] = 50.0           # column-1 outlier, small row total
    _, rows = verify_tail_counts(np.array(fake), test, cfg)
    # sum-only top-1 = row 0; the column-1 top-1 adds row 1
    assert 0 in rows and 1 in rows


def test_extended_query_ids_end_to_end(tmp_path):
    """custom_query_ids (the --query_ids CLI flag) reaches the whole
    pipeline with an extended 8-node atlas pattern (graph_atlas_plus id
    8006, diameter 4 <= depth): truth computes, batches pack, one train
    epoch runs, predictions come back finite."""
    import jax

    from desco_tpu.data.synthetic import generate_synthetic
    from desco_tpu.models.neighborhood import init_neighborhood_model
    from desco_tpu.train import loop as train_loop

    cfg = PipelineConfig(
        custom_query_ids=(6, 8006), depth=4,
        neigh_layer_num=2, neigh_hidden_dim=16,
        neigh_epochs=1, neigh_batch_size=16, neigh_lr=1e-3,
        verify_budget=0.0,
        data_root=str(tmp_path))
    assert cfg.query_ids == [6, 8006]
    graphs = generate_synthetic(6, min_size=8, max_size=14, seed=3)
    stage = prepare_stage_data(cfg, graphs, "q8k")
    assert stage.truth.shape[1] == 2
    qb = build_query_batch(cfg)
    tgt_cfg, qry_cfg = model_configs(cfg)
    params = init_neighborhood_model(jax.random.PRNGKey(0), tgt_cfg,
                                     qry_cfg)
    res = train_loop.train_neighborhood(
        params, tgt_cfg, qry_cfg, qb, stage.batches, stage.batches,
        epochs=1, lr=1e-3, log_fn=lambda *_: None)
    counts = neighborhood_predictions(res.best_params, tgt_cfg, qry_cfg,
                                      qb, stage, cfg)
    assert counts.shape == (len(stage.samples), 2)
    assert np.all(np.isfinite(counts))
    # the size grouping sees two groups (size 3, size 8)
    from desco_tpu.pipeline import pipeline_query_groups

    assert pipeline_query_groups(cfg) == [[0], [1]]


def test_nan_step_guard(tiny_cfg, tiny_data):
    """A batch with non-finite labels must abort training with a clear
    error, and the returned state must never have been touched by the
    poisoned update (reference detect_anomaly analog, main.py:343)."""
    import jax

    from desco_tpu.models.neighborhood import init_neighborhood_model
    from desco_tpu.pipeline import build_query_batch, model_configs
    from desco_tpu.train import loop as train_loop

    train, val, _ = tiny_data
    qb = build_query_batch(tiny_cfg)
    tgt_cfg, qry_cfg = model_configs(tiny_cfg)
    params = init_neighborhood_model(jax.random.PRNGKey(0), tgt_cfg,
                                     qry_cfg)
    bad = train.batches[0].replace(
        y=np.full_like(np.asarray(train.batches[0].y), np.nan))
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_loop.train_neighborhood(
            params, tgt_cfg, qry_cfg, qb, [bad], val.batches,
            epochs=1, lr=1e-3, log_fn=lambda *_: None)


def test_apply_verified_override_mapping(tiny_cfg, tiny_data):
    """Verified neighborhood rows land on their canonical node rows of
    the gossip output (i-th verified neighborhood -> i-th True of the
    indicator)."""
    from desco_tpu.pipeline import apply_verified_override

    _, _, test = tiny_data
    n = len(test.nindex.index)
    q = test.truth.shape[1]
    total = test.workload.total_nodes
    rng = np.random.default_rng(1)
    gossip = rng.random((total, q)).astype(np.float32)
    neigh = rng.random((n, q)).astype(np.float32)
    rows = np.array([0, n - 1], np.int64)
    out = apply_verified_override(gossip, neigh, rows, test.nindex)
    node_rows = np.nonzero(np.asarray(test.nindex.indicator))[0][rows]
    np.testing.assert_array_equal(out[node_rows], neigh[rows])
    mask = np.ones(total, bool)
    mask[node_rows] = False
    np.testing.assert_array_equal(out[mask], gossip[mask])
    # input untouched (returns a copy)
    assert not np.array_equal(out, gossip)


def test_clamp_node_counts(tiny_cfg, tiny_data):
    """Stage-3 clamp: per-node counts fold into [0, UB(v)] of v's
    canonical neighborhood; truth always survives (UB is a true upper
    bound); dropped (edgeless) nodes clamp to exactly 0."""
    from desco_tpu.pipeline import clamp_node_counts

    _, _, test = tiny_data
    total = test.workload.total_nodes
    q = test.truth.shape[1]
    rng = np.random.default_rng(2)
    big = rng.random((total, q)).astype(np.float32) * 1e6  # huge overshoot
    out = clamp_node_counts(big, test, tiny_cfg)
    # truth itself passes the clamp unchanged (bound correctness)
    truth_out = clamp_node_counts(np.asarray(test.truth, np.float32),
                                  test, tiny_cfg)
    np.testing.assert_allclose(truth_out, test.truth, rtol=1e-5)
    # dropped nodes -> exactly 0; kept nodes <= their UB (== truth_out's
    # bound, so out <= max possible)
    node_rows = np.nonzero(np.asarray(test.nindex.indicator))[0]
    mask = np.ones(total, bool)
    mask[node_rows] = False
    assert np.all(out[mask] == 0.0)
    # clamped output never below 0, never above the bound that admitted
    # the truth
    neg = clamp_node_counts(-np.ones((total, q), np.float32), test,
                            tiny_cfg)
    assert np.all(neg >= 0.0)


def test_checkpoint_ensemble_predictions(tiny_cfg, tiny_data):
    """A list of param pytrees serves the ensemble: stage-1 counts are
    the log2(count+1)-space mean of the members, and a singleton list
    matches the single-model path exactly."""
    import jax

    from desco_tpu.models import neighborhood as neigh_mod

    _, _, test = tiny_data
    qb = build_query_batch(tiny_cfg)
    tgt_cfg, qry_cfg = model_configs(tiny_cfg)
    p1 = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(7), tgt_cfg, qry_cfg)
    p2 = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(8), tgt_cfg, qry_cfg)
    cfg = dataclasses.replace(tiny_cfg, clamp_counts=False,
                              verify_budget=0.0)
    c1 = neighborhood_predictions(p1, tgt_cfg, qry_cfg, qb, test, cfg)
    c2 = neighborhood_predictions(p2, tgt_cfg, qry_cfg, qb, test, cfg)
    ens = neighborhood_predictions([p1, p2], tgt_cfg, qry_cfg, qb, test,
                                   cfg)
    want = np.exp2(np.mean([np.log2(np.maximum(c, 0) + 1.0)
                            for c in (c1, c2)], axis=0)) - 1.0
    np.testing.assert_allclose(ens, want, rtol=1e-5, atol=1e-5)
    solo = neighborhood_predictions([p1], tgt_cfg, qry_cfg, qb, test, cfg)
    np.testing.assert_allclose(solo, c1, rtol=1e-6, atol=1e-6)


def test_exact_small_counts_match_truth(tiny_cfg, tiny_data):
    """With cfg.exact_size = 3, every size-3 query column of the served
    stage-1 counts equals the exact canonical ground truth for EVERY
    neighborhood (not just the verified tail), regardless of weights;
    and the post-gossip column override preserves them."""
    import jax

    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.pipeline import (
        apply_exact_column_override, exact_columns)

    _, _, test = tiny_data
    qb = build_query_batch(tiny_cfg)
    tgt_cfg, qry_cfg = model_configs(tiny_cfg)
    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(3), tgt_cfg, qry_cfg)  # untrained on purpose
    cfg = dataclasses.replace(tiny_cfg, exact_size=3, verify_budget=0.0)
    counts = neighborhood_predictions(params, tgt_cfg, qry_cfg, qb,
                                      test, cfg)
    cols = exact_columns(cfg)
    assert len(cols) == len(tiny_cfg.query_ids)  # tiny cfg is size-3 only
    # stage truth is per NODE; neighborhood rows map via the indicator
    node_rows = np.nonzero(np.asarray(test.nindex.indicator))[0]
    np.testing.assert_allclose(counts[:, cols],
                               test.truth[node_rows][:, cols])

    # a fake gossip output is overridden back to exact on those columns
    fake = np.full((test.truth.shape[0], counts.shape[1]), 7.5)
    fixed = apply_exact_column_override(fake, counts, cols, test.nindex)
    np.testing.assert_allclose(fixed[node_rows][:, cols],
                               counts[:, cols])
    untouched = np.setdiff1d(np.arange(counts.shape[1]), cols)
    if len(untouched):
        assert (fixed[:, untouched] == 7.5).all()


def test_bf16_training_and_val_cadence(tiny_cfg, tiny_data, tmp_path):
    """cfg.train_bf16 trains the target tower in bf16 (f32 masters) and
    still learns; cfg.val_every=3 skips val passes on non-multiple
    epochs (NaN in the trace) while best-checkpoint selection keeps
    working on the evaluated epochs."""
    train, val, _ = tiny_data
    cfg = dataclasses.replace(tiny_cfg, train_bf16=True, val_every=3,
                              neigh_epochs=7)
    qb = build_query_batch(cfg)
    res, tgt_cfg, _ = train_neighborhood_stage(
        cfg, train, val, qb, log_fn=lambda *_: None,
        ckpt_path=str(tmp_path / "bf16"))
    # learned in bf16, f32 master params preserved
    assert res.train_losses[-1] < res.train_losses[0]
    import jax.numpy as jnp

    assert tgt_cfg.dtype == jnp.float32  # returned serving cfg is f32
    leaves = [x for x in jax.tree_util.tree_leaves(res.best_params)]
    assert all(le.dtype == jnp.float32 for le in leaves)
    # val cadence: epochs 0,3,6 evaluated; 1,2,4,5 skipped (nan);
    # last epoch always evaluated
    evaluated = [i for i, v in enumerate(res.val_losses)
                 if np.isfinite(v)]
    assert evaluated == [0, 3, 6]
    assert np.isfinite(res.best_val)
    assert (tmp_path / "bf16.best.params.npz").exists()


def test_bf16_loss_tracks_f32(tiny_cfg, tiny_data):
    """The bf16 training loss at identical params tracks f32 within
    bf16 mantissa error (same property as the serving-tower parity
    gate, scoped to the TRAINING entry point train_loss)."""
    import jax.numpy as jnp

    from desco_tpu.models import neighborhood as neigh_mod

    train, _, _ = tiny_data
    qb = build_query_batch(tiny_cfg)
    tgt_cfg, qry_cfg = model_configs(tiny_cfg)
    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
    b = train.batches[0]
    l32 = float(neigh_mod.train_loss(params, tgt_cfg, qry_cfg, b, qb))
    cfg_bf = dataclasses.replace(tgt_cfg, dtype=jnp.bfloat16)
    lbf = float(neigh_mod.train_loss(params, cfg_bf, qry_cfg, b, qb))
    assert abs(lbf - l32) < 0.05 * max(1.0, abs(l32))
    # gradients flow and stay f32 (master-weight mixed precision)
    g = jax.grad(lambda p: neigh_mod.train_loss(p, cfg_bf, qry_cfg,
                                                b, qb))(params)
    gl = jax.tree_util.tree_leaves(g)
    assert all(x.dtype == jnp.float32 for x in gl)
    assert sum(float(jnp.abs(x).sum()) for x in gl) > 0


def test_bf16_training_validates_on_f32_tower(tiny_cfg, tiny_data,
                                              monkeypatch):
    """With train_bf16, validation must run the F32 tower (the forward
    serving uses), not the bf16 step tower: the pipeline passes
    eval_tgt_cfg=f32 through to train_neighborhood, and the eval_fn it
    builds computes the f32 loss. Guards the documented contract of
    --neigh_bf16_train ('loss and val metrics stay f32')."""
    import jax.numpy as jnp

    from desco_tpu.train import loop as train_loop

    train, val, _ = tiny_data
    cfg = dataclasses.replace(tiny_cfg, train_bf16=True, neigh_epochs=1)
    qb = build_query_batch(cfg)
    seen = {}
    orig = train_loop.train_neighborhood

    def spy(params, tgt_cfg, *a, **kw):
        seen["step_dtype"] = tgt_cfg.dtype
        seen["eval_cfg"] = kw.get("eval_tgt_cfg")
        return orig(params, tgt_cfg, *a, **kw)

    monkeypatch.setattr(train_loop, "train_neighborhood", spy)
    train_neighborhood_stage(cfg, train, val, qb,
                             log_fn=lambda *_: None)
    assert seen["step_dtype"] == jnp.bfloat16
    assert seen["eval_cfg"] is not None
    assert seen["eval_cfg"].dtype == jnp.float32
