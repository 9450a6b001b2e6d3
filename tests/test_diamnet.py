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
