"""DIAMNet baseline: memory init semantics, gated attention, end-to-end
loss decrease."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desco_tpu.models.diamnet import (
    DIAMNetConfig,
    apply_diamnet,
    gated_mha,
    init_diamnet,
    init_mem_mean,
)


def test_init_mem_mean_matches_torch_pooling(rng):
    """Strided mean-pool windows must match torch's
    avg_pool1d(kernel=L-(M-1)*stride, stride=L//M) per actual length."""
    B, L, D, M = 3, 10, 4, 4
    g = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([10, 7, 2])
    g_masked = g.copy()
    for b, l in enumerate(lens):
        g_masked[b, l:] = 0.0
    mem, mem_mask = init_mem_mean(jnp.asarray(g_masked), jnp.asarray(lens), M)
    mem = np.asarray(mem)
    for b, l in enumerate(lens):
        if l < M:
            for w in range(M):
                if w < l:
                    np.testing.assert_allclose(mem[b, w], g[b, w],
                                               rtol=1e-5)
                else:
                    np.testing.assert_allclose(mem[b, w], 0.0)
            continue
        stride = l // M
        kernel = l - (M - 1) * stride
        for w in range(M):
            ref = g[b, w * stride:w * stride + kernel].mean(0)
            np.testing.assert_allclose(mem[b, w], ref, rtol=1e-5,
                                       atol=1e-6)
    assert np.all(np.asarray(mem_mask)[0] == 1)
    assert np.asarray(mem_mask)[2].sum() == 2


def test_gate_mechanism(rng):
    """out = gate*q + (1-gate)*attn with gate bias init 1
    (DIAMNet.py:516-517, 590-592): with zeroed gate weights and zeroed
    output projection, out == sigmoid(1) * q exactly."""
    cfg = DIAMNetConfig(hidden_dim=16, pattern_dim=16, graph_dim=16,
                        num_heads=4)
    params = init_diamnet(jax.random.PRNGKey(0), cfg)
    p = dict(params["g_attn"])
    p["g_w"] = jnp.zeros_like(p["g_w"])
    p["o"] = jnp.zeros_like(p["o"])
    q = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
    mask = jnp.ones((2, 6))
    out = gated_mha(p, q, k, k, mask, 4)
    np.testing.assert_allclose(np.asarray(out),
                               float(jax.nn.sigmoid(1.0)) * np.asarray(q),
                               rtol=1e-5)
    # masking: fully-masked keys attend nowhere -> attn finite (softmax
    # over -inf row would NaN without the guard)
    out2 = gated_mha(params["g_attn"], q, k, k, jnp.zeros((2, 6)), 4)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_diamnet_learns(rng):
    """Tiny regression: predict from sequence statistics, loss falls."""
    import optax

    cfg = DIAMNetConfig(hidden_dim=16, pattern_dim=16, graph_dim=16,
                        num_heads=4, mem_len=4)
    params = init_diamnet(jax.random.PRNGKey(1), cfg)
    B, Lg, Lp = 16, 12, 5
    g = rng.standard_normal((B, Lg, 16)).astype(np.float32)
    p = rng.standard_normal((B, Lp, 16)).astype(np.float32)
    g_len = np.full(B, Lg)
    p_len = np.full(B, Lp)
    y = g.mean((1, 2), keepdims=False)[:, None].astype(np.float32)

    def loss_fn(params):
        pred = apply_diamnet(params, cfg, jnp.asarray(p),
                             jnp.asarray(p_len), jnp.asarray(g),
                             jnp.asarray(g_len))
        return ((pred - y) ** 2).mean()

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, grad = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grad, opt, params)
        return optax.apply_updates(params, u), opt, loss

    l0 = float(loss_fn(params))
    for _ in range(60):
        params, opt, loss = step(params, opt)
    assert float(loss) < l0 * 0.5


def test_init_mem_sum_max_match_windows(rng):
    """'sum'/'max' variants (DIAMNet.py:865-875) against per-window
    numpy pooling."""
    from desco_tpu.models.diamnet import init_mem_max, init_mem_sum

    B, L, D, M = 3, 11, 4, 4
    g = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([11, 6, 3])
    for b, l in enumerate(lens):
        g[b, l:] = 0.0
    mem_s = np.asarray(init_mem_sum(jnp.asarray(g), jnp.asarray(lens), M)[0])
    mem_m = np.asarray(init_mem_max(jnp.asarray(g), jnp.asarray(lens), M)[0])
    for b, l in enumerate(lens):
        if l < M:
            for w in range(M):
                ref = g[b, w] if w < l else np.zeros(D)
                np.testing.assert_allclose(mem_s[b, w], ref, rtol=1e-5)
                np.testing.assert_allclose(mem_m[b, w], ref, rtol=1e-5)
            continue
        stride = l // M
        kernel = l - (M - 1) * stride
        for w in range(M):
            win = g[b, w * stride:w * stride + kernel]
            np.testing.assert_allclose(mem_s[b, w], win.sum(0), rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(mem_m[b, w], win.max(0), rtol=1e-5)


def test_init_mem_circular_matches_torch_semantics(rng):
    """circular_{mean,sum,max} == pooling over the explicitly
    circular-padded sequence (F.pad mode='circular' + strided pooling,
    DIAMNet.py:846-876), per actual length; len == mem_len bypasses the
    pad (the torch seq_len == mem_len branch)."""
    from desco_tpu.models.diamnet import init_mem_circular

    B, L, D, M = 4, 10, 3, 4
    g = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([10, 7, 4, 2])  # long, long, == M, short
    for b, l in enumerate(lens):
        g[b, l:] = 0.0
    out = {k: np.asarray(init_mem_circular(
        jnp.asarray(g), jnp.asarray(lens), M, k)[0])
        for k in ("mean", "sum", "max")}
    for b, l in enumerate(lens):
        if l <= M:  # short/identity fallback
            for w in range(M):
                ref = g[b, w] if w < l else np.zeros(D)
                for k in out:
                    np.testing.assert_allclose(out[k][b, w], ref,
                                               rtol=1e-5, atol=1e-6)
            continue
        pad = int(np.ceil((l + 1) / 2)) - 1
        ext = np.concatenate([g[b, :l], g[b, :pad]], axis=0)  # circular
        el = l + pad
        stride = el // M
        kernel = el - (M - 1) * stride
        for w in range(M):
            win = ext[w * stride:w * stride + kernel]
            np.testing.assert_allclose(out["mean"][b, w], win.mean(0),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(out["sum"][b, w], win.sum(0),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(out["max"][b, w], win.max(0),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mem_init", ["sum", "max", "attn", "lstm",
                                      "circular_mean", "circular_sum",
                                      "circular_max"])
def test_diamnet_mem_init_variants_forward(rng, mem_init):
    """Every mem_init variant runs end-to-end with finite output and
    nonzero gradients (flags-accepted bar for DIAMNet.py:801-921)."""
    cfg = DIAMNetConfig(pattern_dim=8, graph_dim=8, hidden_dim=8,
                        num_heads=2, mem_init=mem_init)
    params = init_diamnet(jax.random.PRNGKey(1), cfg)
    B, Lp, Lg = 3, 5, 9
    pattern = jnp.asarray(rng.standard_normal((B, Lp, 8)), jnp.float32)
    graph = jnp.asarray(rng.standard_normal((B, Lg, 8)), jnp.float32)
    p_len = jnp.asarray([5, 3, 4])
    g_len = jnp.asarray([9, 7, 2])  # includes the short (< mem_len) path

    def loss(p):
        # linear loss: the final pred layer inits to zeros, so a squared
        # loss would have exactly-zero gradients at init
        return apply_diamnet(p, cfg, pattern, p_len, graph, g_len).sum()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gsum = jax.tree_util.tree_reduce(
        lambda a, le: a + float(jnp.abs(le).sum()), grads, 0.0)
    assert np.isfinite(gsum) and gsum > 0.0


def test_init_mem_lstm_carry_crosses_windows(rng):
    """The LSTM carry persists across windows (torch: `_, hx =
    lstm(m, hx)` in a loop, DIAMNet.py:898-906): a numpy LSTM over the
    concatenated window elements must reproduce the slots."""
    from desco_tpu.models.diamnet import init_mem_lstm

    cfg = DIAMNetConfig(pattern_dim=4, graph_dim=4, hidden_dim=4,
                        num_heads=2, mem_init="lstm")
    params = init_diamnet(jax.random.PRNGKey(2), cfg)
    B, L, M = 1, 9, 4
    g = rng.standard_normal((B, L, 4)).astype(np.float32)
    lens = np.array([9])
    mem = np.asarray(init_mem_lstm(params, cfg, jnp.asarray(g),
                                   jnp.asarray(lens))[0])

    wi = np.asarray(params["mem_lstm"]["wi"])
    wh = np.asarray(params["mem_lstm"]["wh"])
    bb = np.asarray(params["mem_lstm"]["b"])
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    h = np.zeros(4)
    c = np.zeros(4)
    stride, kernel = lens[0] // M, lens[0] - (M - 1) * (lens[0] // M)
    for w in range(M):
        for l in range(w * stride, w * stride + kernel):
            gates = g[0, l] @ wi + h @ wh + bb
            i, f, gg, o = np.split(gates, 4)
            c = sig(f) * c + sig(i) * np.tanh(gg)
            h = sig(o) * np.tanh(c)
        np.testing.assert_allclose(mem[0, w], h, rtol=1e-4, atol=1e-5)


def test_padding_graphs_do_not_poison_loss(rng):
    """A packed batch with PAD graphs (length 0) must produce a finite
    loss: the 1/len feature columns used inf denominators and 0 * inf
    = NaN ignored the loss mask (found training on Syn_1827, where the
    last batch packs 44-56 real graphs of 64)."""
    import jax
    import numpy as np

    from desco_tpu.batch.build import gossip_sample, query_sample
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.graph.atlas import gen_queries, gen_query_ids
    from desco_tpu.models.baseline_diamnet import (
        DIAMNetConfig, diamnet_tower_config, diamnet_train_loss,
        init_diamnet_pipeline, node_positions,
    )
    from conftest import random_graph

    qids = gen_query_ids([3])
    n_q = len(qids)
    samples = []
    for _ in range(3):  # 3 real graphs, g_cap 8 -> 5 pad graphs
        g = random_graph(rng, 10, 0.4)
        s = gossip_sample(g, np.zeros((g.n_nodes, n_q), np.float32),
                          np.zeros((g.n_nodes, n_q), np.float32))
        import dataclasses

        s = dataclasses.replace(
            s, y=rng.integers(0, 9, (1, n_q)).astype(np.float32),
            x=np.zeros((g.n_nodes, 1), np.float32))
        samples.append(s)
    n_cap, e_cap, _ = auto_capacities(samples, g_cap=8)
    [b] = pack_samples(samples, n_cap, e_cap, 8, n_queries=n_q)
    assert int(np.asarray(b.graph_mask).sum()) == 3  # pads present

    qs = [query_sample(q, use_tconv=False) for q in gen_queries(qids)]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))
    tower_cfg = diamnet_tower_config(16, 2, "GIN")
    dn_cfg = DIAMNetConfig(pattern_dim=16, graph_dim=16, hidden_dim=16,
                           mem_init="mean")
    params = init_diamnet_pipeline(jax.random.PRNGKey(0), tower_cfg,
                                   dn_cfg)
    loss = diamnet_train_loss(
        params, tower_cfg, dn_cfg, b, np.asarray(node_positions(b)), 12,
        qb, np.asarray(node_positions(qb)), 3)
    assert np.isfinite(float(loss)), float(loss)

@pytest.mark.parametrize("mem_init", ["circular_attn", "circular_lstm"])
def test_diamnet_circular_attn_lstm_forward(rng, mem_init):
    """The last two mem_init variants (DIAMNet.py:811-812) run
    end-to-end with finite output and nonzero gradients."""
    cfg = DIAMNetConfig(pattern_dim=8, graph_dim=8, hidden_dim=8,
                        num_heads=2, mem_init=mem_init)
    params = init_diamnet(jax.random.PRNGKey(1), cfg)
    B, Lp, Lg = 3, 5, 9
    pattern = jnp.asarray(rng.standard_normal((B, Lp, 8)), jnp.float32)
    graph = jnp.asarray(rng.standard_normal((B, Lg, 8)), jnp.float32)
    p_len = jnp.asarray([5, 3, 4])
    g_len = jnp.asarray([9, 7, 2])

    def loss(p):
        return apply_diamnet(p, cfg, pattern, p_len, graph, g_len).sum()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gsum = jax.tree_util.tree_reduce(
        lambda a, le: a + float(jnp.abs(le).sum()), grads, 0.0)
    assert np.isfinite(gsum) and gsum > 0.0


@pytest.mark.parametrize("kind", ["attn", "lstm"])
def test_circular_attn_lstm_match_explicit_padding(rng, kind):
    """circular_attn/circular_lstm == the plain attn/lstm window loop
    run on the EXPLICITLY circular-padded sequence (F.pad
    mode='circular' then the same stride/kernel rule over the extended
    length, DIAMNet.py:846-906): per-sample parity for len > mem_len."""
    from desco_tpu.models.diamnet import init_mem_attn, init_mem_lstm

    fn = {"attn": init_mem_attn, "lstm": init_mem_lstm}[kind]
    cfg = DIAMNetConfig(pattern_dim=4, graph_dim=4, hidden_dim=4,
                        num_heads=2, mem_init=f"circular_{kind}")
    params = init_diamnet(jax.random.PRNGKey(3), cfg)
    B, L, M = 3, 10, 4
    g = rng.standard_normal((B, L, 4)).astype(np.float32)
    lens = np.array([10, 7, 6])  # all > M: the circular regime
    for b, l in enumerate(lens):
        g[b, l:] = 0.0

    got = np.asarray(fn(params, cfg, jnp.asarray(g), jnp.asarray(lens),
                        circular=True)[0])

    # explicit circular pad, one sample at a time (ragged lengths)
    for b, l in enumerate(lens):
        pad = int(np.ceil((l + 1) / 2)) - 1
        ext = np.concatenate([g[b, :l], g[b, :pad]], axis=0)[None]
        ref = np.asarray(fn(params, cfg, jnp.asarray(ext),
                            jnp.asarray([l + pad]), circular=False)[0])
        np.testing.assert_allclose(got[b], ref[0], rtol=1e-4, atol=1e-5)
