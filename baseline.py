"""Baseline driver: whole-graph counting with DIAMNet or LRP.

Counterpart of the reference's baseline.py (57-312): graph-level
(graphlet) counting with either the GIN-embedding + DIAMNet
memory-attention counter or Local Relational Pooling, trained/evaluated
on the standard queries with log2(+1) smooth-L1 semantics.

Usage: python baseline.py --baseline DIAMNET|LRP --train_dataset Syn_64
       --test_dataset Syn_64_test [--epoch_num N] ...
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", type=str, default="DIAMNET",
                   choices=["DIAMNET", "LRP"])
    p.add_argument("--train_dataset", type=str, default="Syn_64")
    p.add_argument("--valid_dataset", type=str, default=None)
    p.add_argument("--test_dataset", type=str, nargs="+",
                   default=["Syn_64"],
                   help="one or more eval sets; the model is trained "
                        "once and evaluated on each")
    p.add_argument("--query_sizes", type=int, nargs="+", default=[3, 4, 5])
    p.add_argument("--conv_type", type=str, default="GIN")
    p.add_argument("--mem_init", type=str, default="mean",
                   choices=["mean", "sum", "max", "attn", "lstm",
                            "circular_mean", "circular_sum",
                            "circular_max", "circular_attn",
                            "circular_lstm"],
                   help="DIAMNet memory init variant (DIAMNet.py:801-921)")
    p.add_argument("--layer_num", type=int, default=3)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--epoch_num", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    args.valid_dataset = args.valid_dataset or args.train_dataset

    import os

    import jax

    # honor JAX_PLATFORMS=cpu: the container registers the TPU plugin at
    # interpreter start, so the env var alone is silently ignored (same
    # guard as __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import optax

    from desco_tpu.analysis import round_relu
    from desco_tpu.batch.build import query_sample
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload
    from desco_tpu.graph.atlas import gen_queries, gen_query_ids, groupby_size
    from desco_tpu.models.baseline_diamnet import (
        DIAMNetConfig,
        diamnet_forward,
        diamnet_tower_config,
        diamnet_train_loss,
        init_diamnet_pipeline,
        node_positions,
    )

    qids = gen_query_ids(args.query_sizes)
    queries = gen_queries(qids)

    def stage(name):
        graphs = load_data(name, args.data_root)
        wl = Workload(graphs, root=f"{args.data_root}/{name}", name=name)
        truth = wl.compute_groundtruth(qids)
        samples = wl.wo_canonical_samples(qids, use_tconv=False,
                                          truth=truth)
        caps = auto_capacities(samples, g_cap=args.batch_size)
        batches = pack_samples(samples, *caps, n_queries=len(qids))
        return wl, batches

    _, train_b = stage(args.train_dataset + "_train")
    _, val_b = stage(args.valid_dataset + "_val")
    test_sets = [(name, stage(name)[1]) for name in args.test_dataset]

    if args.baseline == "LRP":
        return run_lrp(args, qids, train_b, val_b, test_sets)

    qs = [query_sample(q, use_tconv=False) for q in queries]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))
    q_pos = node_positions(qb)
    q_seq_len = max(args.query_sizes)

    tower_cfg = diamnet_tower_config(args.hidden_dim, args.layer_num,
                                     args.conv_type)
    dn_cfg = DIAMNetConfig(pattern_dim=args.hidden_dim,
                           graph_dim=args.hidden_dim,
                           hidden_dim=args.hidden_dim,
                           mem_init=args.mem_init)
    params = init_diamnet_pipeline(jax.random.PRNGKey(args.seed),
                                   tower_cfg, dn_cfg)

    # sequence length = max nodes of any single graph across all splits
    seq_len = max(
        int(np.bincount(np.asarray(b.node_graph)[
            np.asarray(b.node_mask) > 0]).max())
        for _, bs in [("tr", train_b), ("va", val_b)] + test_sets
        for b in bs)

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b, pos):
        def lf(p):
            return diamnet_train_loss(p, tower_cfg, dn_cfg, b, pos,
                                      seq_len, qb, q_pos, q_seq_len)

        loss, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    @jax.jit
    def val_loss_fn(params, b, pos):
        return diamnet_train_loss(params, tower_cfg, dn_cfg, b, pos,
                                  seq_len, qb, q_pos, q_seq_len)

    def val_loss(params):
        return float(np.mean([
            float(val_loss_fn(params, b, jax.numpy.asarray(
                node_positions(b)))) for b in val_b]))

    positions = [jax.numpy.asarray(node_positions(b)) for b in train_b]
    best_val, best_params = float("inf"), params
    import time as _time
    for epoch in range(args.epoch_num):
        t0 = _time.time()
        losses = []
        for b, pos in zip(train_b, positions):
            params, opt, loss = step(params, opt, b, pos)
            losses.append(float(loss))
        vl = val_loss(params)
        if vl < best_val:
            best_val = vl
            best_params = jax.tree_util.tree_map(jax.numpy.copy, params)
        if epoch % 10 == 0 or epoch == args.epoch_num - 1:
            print(f"epoch {epoch:4d} train {np.mean(losses):.5f} "
                  f"val {vl:.5f} {_time.time() - t0:.1f}s", flush=True)
    params = best_params
    print(f"best val {best_val:.5f}")

    # evaluate: de-logged graphlet counts
    @jax.jit
    def predict(params, b, pos):
        pred = diamnet_forward(params, tower_cfg, dn_cfg, b, pos, seq_len,
                               qb, q_pos, q_seq_len)
        # log-space clamp before the de-log: no graph here can hold 2^60
        # occurrences of a size<=5 query (n^5 < 2^49 at n=800), so the
        # clamp only stops float32 overflow on diverged predictions from
        # poisoning the whole row with inf (the reference's unclamped
        # 2^pred has the same fragility, lightning_model.py:278)
        return 2.0 ** jax.numpy.minimum(pred, 60.0) - 1.0

    groups = groupby_size(qids)
    for name, test_b in test_sets:
        preds, truths = [], []
        for b in test_b:
            pos = jax.numpy.asarray(node_positions(b))
            out = np.asarray(predict(params, b, pos))
            valid = np.asarray(b.graph_mask) > 0
            preds.append(out[valid])
            truths.append(np.asarray(b.y)[valid])
        preds = np.concatenate(preds)
        truths = np.concatenate(truths)
        _report("DIAMNET", name, round_relu(preds), truths, groups)
    return 0


def _report(tag, name, preds, truths, groups):
    import json

    from desco_tpu.analysis import mae, norm_mse

    nm = norm_mse(preds, truths, groups)
    ma = mae(preds, truths, groups)
    print(f"{tag} {name} graphlet_norm_mse:", nm)
    print(f"{tag} {name} graphlet_mae:", ma)
    print(json.dumps({"baseline": tag, "dataset": name,
                      "norm_mse": [float(v) for v in nm],
                      "mae": [float(v) for v in ma]}), flush=True)


def run_lrp(args, qids, train_b, val_b, test_sets) -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from desco_tpu.analysis import round_relu
    from desco_tpu.graph.atlas import groupby_size
    from desco_tpu.models.lrp import (
        LRPConfig,
        apply_lrp_batch,
        init_lrp,
        lrp_arrays_for_batch,
    )
    from desco_tpu.models.neighborhood import smooth_l1

    cfg = LRPConfig(hid_dim=args.hidden_dim, num_layers=args.layer_num,
                    num_tasks=len(qids))
    params = init_lrp(jax.random.PRNGKey(args.seed), cfg)

    def prep(batches):
        arrs = [lrp_arrays_for_batch(b, cfg) for b in batches]
        p_cap = max(a[0].shape[0] for a in arrs)
        p_cap = ((p_cap + 127) // 128) * 128
        return [lrp_arrays_for_batch(b, cfg, p_cap=p_cap)
                for b in batches], p_cap

    train_arrs, _ = prep(train_b)
    val_arrs, _ = prep(val_b)

    def loss_fn(params, b, pn, pa, po, dg):
        pred = apply_lrp_batch(params, cfg, b, pn, pa, po, dg)
        target = jnp.log2(b.y + 1.0)
        m = b.graph_mask
        per_q = (smooth_l1(pred, target) * m[:, None]).sum(0) / \
            jnp.maximum(m.sum(), 1.0)
        return per_q.mean()

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b, pn, pa, po, dg):
        loss, g = jax.value_and_grad(loss_fn)(params, b, pn, pa, po, dg)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    val_jit = jax.jit(loss_fn)

    def val_loss(params):
        return float(np.mean([
            float(val_jit(params, b, pn, pa, po, dg))
            for b, (pn, pa, po, dg) in zip(val_b, val_arrs)]))

    import time as _time
    best_val, best_params = float("inf"), params
    for epoch in range(args.epoch_num):
        t0 = _time.time()
        losses = []
        for b, (pn, pa, po, dg) in zip(train_b, train_arrs):
            params, opt, loss = step(params, opt, b, pn, pa, po, dg)
            losses.append(float(loss))
        vl = val_loss(params)
        if vl < best_val:
            best_val = vl
            best_params = jax.tree_util.tree_map(jnp.copy, params)
        if epoch % 10 == 0 or epoch == args.epoch_num - 1:
            print(f"epoch {epoch:4d} train {np.mean(losses):.5f} "
                  f"val {vl:.5f} {_time.time() - t0:.1f}s", flush=True)
    params = best_params
    print(f"best val {best_val:.5f}")

    @jax.jit
    def predict(params, b, pn, pa, po, dg):
        # same log-space overflow clamp as the DIAMNet predict
        return 2.0 ** jnp.minimum(
            apply_lrp_batch(params, cfg, b, pn, pa, po, dg), 60.0) - 1.0

    groups = groupby_size(qids)
    for name, test_b in test_sets:
        test_arrs, _ = prep(test_b)
        preds, truths = [], []
        for b, (pn, pa, po, dg) in zip(test_b, test_arrs):
            out = np.asarray(predict(params, b, pn, pa, po, dg))
            valid = np.asarray(b.graph_mask) > 0
            preds.append(out[valid])
            truths.append(np.asarray(b.y)[valid])
        preds = np.concatenate(preds)
        truths = np.concatenate(truths)
        _report("LRP", name, round_relu(preds), truths, groups)
    return 0


if __name__ == "__main__":
    sys.exit(main())
