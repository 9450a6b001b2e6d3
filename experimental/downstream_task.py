"""Downstream utility of predicted counts: node classification.

Counterpart of the reference's experimental/downstream_task.py:33-60+: a
small MLP classifies nodes using (a) exact canonical counts and (b) the
pipeline's predicted counts as input features, comparing accuracies —
evidence the learned counts carry real structural signal.

Here the task is synthetic-but-structural: classify whether a node's
triangle participation is above the dataset median, training the MLP on
size-3/4/5 canonical count features.

Usage: python experimental/downstream_task.py --dataset Syn_64
       [--pred_csv output/.../gossip_node_<ds>_results.csv]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="Syn_64")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--pred_csv", type=str, default=None,
                   help="node-level predicted counts CSV (from main.py)")
    p.add_argument("--epochs", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload
    from desco_tpu.graph.atlas import gen_query_ids
    from desco_tpu.models.init import mlp_params

    graphs = load_data(args.dataset, args.data_root)
    wl = Workload(graphs, root=f"{args.data_root}/{args.dataset}",
                  name=args.dataset)
    qids = gen_query_ids([3, 4, 5])
    truth = wl.compute_groundtruth(qids)

    # label: triangle count above median (query index 1 = triangle)
    y = (truth[:, 1] > np.median(truth[:, 1])).astype(np.int32)

    def run(features: np.ndarray, tag: str) -> float:
        x = np.log2(features.astype(np.float64) + 1).astype(np.float32)
        rng = np.random.default_rng(0)
        perm = rng.permutation(len(x))
        split = int(0.7 * len(x))
        tr, te = perm[:split], perm[split:]

        params = mlp_params(jax.random.PRNGKey(0), [x.shape[1], 64, 64, 2])

        def forward(params, x):
            (w1, b1), (w2, b2), (w3, b3) = params
            h = jax.nn.relu(x @ w1 + b1)
            h = jax.nn.relu(h @ w2 + b2)
            return h @ w3 + b3

        def loss_fn(params, x, y):
            logits = forward(params, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, x, y):
            loss, g = jax.value_and_grad(loss_fn)(params, x, y)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, loss

        xt, yt = jnp.asarray(x[tr]), jnp.asarray(y[tr])
        for _ in range(args.epochs):
            params, opt, _ = step(params, opt, xt, yt)
        pred = np.asarray(forward(params, jnp.asarray(x[te]))).argmax(-1)
        acc = float((pred == y[te]).mean())
        print(f"node-classification acc with {tag} counts: {acc:.4f}")
        return acc

    # exclude the label query (index 1) from the features
    feat_cols = [i for i in range(truth.shape[1]) if i != 1]
    run(truth[:, feat_cols], "exact")
    if args.pred_csv:
        pred = np.loadtxt(args.pred_csv, delimiter=",", skiprows=1)[:, 1:]
        run(pred[:, feat_cols], "predicted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
