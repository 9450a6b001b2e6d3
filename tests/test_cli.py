"""CLI driver end-to-end: main.py trains and serves data-parallel over
the 8-virtual-device CPU mesh (--n_devices, the reference wires Lightning
DDP here — main.py:242-255), and DP serving through the CLI is
bit-identical to the single-device run."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from main import main as cli_main  # noqa: E402


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    return {
        "data": str(tmp_path_factory.mktemp("data")),
        "ckpt": str(tmp_path_factory.mktemp("ckpt")),
        "out": str(tmp_path_factory.mktemp("out")),
    }


def _common(roots, out_name):
    return [
        "--train_dataset", "syn_24", "--valid_dataset", "syn_24",
        "--test_dataset", "syn_12",
        "--query_sizes", "3",
        "--depth", "3",
        "--neigh_layer_num", "2", "--neigh_hidden_dim", "16",
        "--neigh_batch_size", "16",
        "--gossip_hidden_dim", "16", "--gossip_batch_size", "16",
        "--data_root", roots["data"],
        "--output_dir", os.path.join(roots["out"], out_name),
        "--neigh_model_path", os.path.join(roots["ckpt"], "neigh"),
        "--gossip_model_path", os.path.join(roots["ckpt"], "gossip"),
    ]


@pytest.fixture(scope="module")
def trained_dp(roots):
    """Train both stages end-to-end through the CLI on the 8-device
    mesh (the reference can only DDP the neighborhood stage)."""
    rc = cli_main(_common(roots, "train_dp") + [
        "--train_neigh", "--train_gossip", "--test_gossip",
        "--neigh_epoch_num", "2", "--gossip_epoch_num", "1",
        "--n_devices", "8",
    ])
    assert rc == 0
    return roots


def test_cli_dp_train_runs(trained_dp):
    out = os.path.join(trained_dp["out"], "train_dp")
    res = open(os.path.join(out, "analyze_results_syn_12.txt")).read()
    assert "norm_mse_gossip" in res
    # every metric line parses to floats (mae is always finite)
    for line in res.strip().splitlines():
        vals = [float(x) for x in
                line.split(": ", 1)[1].strip("[]\n").split(",")]
        if line.startswith("graphlet_mae"):
            assert all(np.isfinite(v) for v in vals), line
    assert os.path.exists(os.path.join(trained_dp["ckpt"],
                                       "neigh.best.params.npz"))


@pytest.mark.parametrize("n_devices", ["1", "8"])
def test_cli_eval_checkpoint(trained_dp, n_devices):
    rc = cli_main(_common(trained_dp, f"eval_d{n_devices}") + [
        "--test_gossip",
        "--neigh_checkpoint",
        os.path.join(trained_dp["ckpt"], "neigh.best"),
        "--gossip_checkpoint",
        os.path.join(trained_dp["ckpt"], "gossip.best"),
        "--n_devices", n_devices,
    ])
    assert rc == 0


def test_cli_dp_serving_bit_identical(trained_dp):
    """The same checkpoints through --n_devices 1 vs 8 produce byte-equal
    final graphlet counts (DP serving exactness, parallel/dp.py)."""
    a = open(os.path.join(trained_dp["out"], "eval_d1",
                          "graphlet_count_syn_12.csv")).read()
    b = open(os.path.join(trained_dp["out"], "eval_d8",
                          "graphlet_count_syn_12.csv")).read()
    assert a == b


def test_query_ids_flag_reaches_config():
    from desco_tpu.config import build_parser, to_pipeline_config

    args = build_parser().parse_args(["--query_ids", "6", "8006"])
    cfg = to_pipeline_config(args)
    assert cfg.query_ids == [6, 8006]
    # without the flag, sizes derive the standard 29
    args = build_parser().parse_args(["--query_sizes", "3", "4", "5"])
    cfg = to_pipeline_config(args)
    assert len(cfg.query_ids) == 29


def test_neigh_checkpoint_accepts_multiple_paths():
    from desco_tpu.config import build_parser

    args = build_parser().parse_args(
        ["--neigh_checkpoint", "ckpt/a/neigh.best", "ckpt/b/neigh.best"])
    assert args.neigh_checkpoint == ["ckpt/a/neigh.best",
                                     "ckpt/b/neigh.best"]
    args = build_parser().parse_args(["--neigh_checkpoint", "just/one"])
    assert args.neigh_checkpoint == ["just/one"]


def test_cli_extended_query_end_to_end(roots):
    """The 8-14-node benchmark patterns (atlas-plus ids 8000+,
    reference workload.py:1128-1671) run end-to-end through the CLI:
    ground truth, both training stages, and the final metrics for an
    8-node query (id 8006, diameter 4 = the default depth)."""
    rc = cli_main(_common(roots, "train_q8") + [
        "--train_neigh", "--train_gossip", "--test_gossip",
        "--neigh_epoch_num", "1", "--gossip_epoch_num", "1",
        "--query_ids", "6", "7", "8006",
        "--depth", "4",
    ])
    assert rc == 0
    out = os.path.join(roots["out"], "train_q8")
    counts = open(os.path.join(out, "graphlet_count_syn_12.csv")).read()
    header = counts.splitlines()[0]
    assert len(header.split(",")) == 4  # index + one column per query
    res = open(os.path.join(out, "analyze_results_syn_12.txt")).read()
    assert "norm_mse_gossip" in res


def test_degree_feature_end_to_end(roots):
    """--neigh_degree_feature trains with log2(1+deg) inputs end to end,
    persists the flag in the checkpoint config blob, and checkpoint eval
    with the same flag works. (main.py builds its config from ARGS —
    the eval run must repeat the flag; CountingService rehydrates it
    from the blob automatically.)"""
    import json

    from desco_tpu.batch.build import query_sample
    from desco_tpu.graph.atlas import gen_queries
    from desco_tpu.pipeline import apply_degree_feature

    # unit: the feature really lands in x as log2(1+deg)
    [q] = gen_queries([7])  # triangle (atlas id 7; id 6 is the path)
    s = query_sample(q)
    apply_degree_feature([s])
    np.testing.assert_allclose(s.x[:, 0], np.log2(3.0), rtol=1e-6)

    ck = os.path.join(roots["ckpt"], "neigh_degf")
    rc = cli_main(_common(roots, "train_degf") + [
        "--train_neigh", "--train_gossip", "--test_gossip",
        "--neigh_epoch_num", "2", "--gossip_epoch_num", "1",
        "--neigh_degree_feature",
        "--neigh_model_path", ck,
        "--gossip_model_path", os.path.join(roots["ckpt"], "gossip_degf"),
    ])
    assert rc == 0
    with open(ck + ".best.json") as f:
        meta = json.load(f)
    assert meta["config"]["degree_feature"] is True
    rc = cli_main(_common(roots, "eval_degf") + [
        "--test_gossip", "--neigh_degree_feature",
        "--neigh_checkpoint", ck + ".best",
        "--gossip_checkpoint",
        os.path.join(roots["ckpt"], "gossip_degf") + ".best",
    ])
    assert rc == 0


def test_bf16_train_and_val_every_flags_reach_config():
    from desco_tpu.config import build_parser, to_pipeline_config

    args = build_parser().parse_args(["--neigh_bf16_train",
                                      "--val_every", "5"])
    cfg = to_pipeline_config(args)
    assert cfg.train_bf16 is True and cfg.val_every == 5
    # defaults: reference parity
    cfg0 = to_pipeline_config(build_parser().parse_args([]))
    assert cfg0.train_bf16 is False and cfg0.val_every == 1
    # degree feature + node labels are mutually exclusive (the degree
    # write would clobber column 0 of the one-hot labels)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        to_pipeline_config(build_parser().parse_args(
            ["--neigh_degree_feature", "--use_node_feature"]))
