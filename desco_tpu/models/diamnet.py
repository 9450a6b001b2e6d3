"""DIAMNet baseline: dynamic-memory attention counter.

TPU-native rebuild of the reference's DIAMNet
(/root/reference/subgraph_counting/DIAMNet.py:17-247, 469-677, 801-921)
— the whole-graph baseline compared in the paper (GIN node embeddings ->
memory-attention counter). Differences from the torch original are purely
mechanical:

  * graphs/patterns arrive as PADDED [B, L, D] sequences with masks (the
    torch code groups samples by equal length and loops; here the
    strided mean-pool memory init is expressed as one dense [B, M, L]
    window-weight einsum parameterized by per-sample lengths — static
    shapes, MXU-friendly).
  * mem_init 'mean' only (the paper's config); attn/lstm variants are
    intentionally omitted.

Semantics kept: gated pre-LN multi-head attention
(out = g*q + (1-g)*attn, gate bias init 1 so fresh models pass the query
through), recurrent mem <- p_attn <- g_attn steps, prediction head fed
with [mem, len, inv_len] features, N(0, 1/sqrt(h)) / zeros init.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DIAMNetConfig:
    pattern_dim: int = 64
    graph_dim: int = 64
    hidden_dim: int = 64
    num_heads: int = 4
    mem_len: int = 4
    recurrent_steps: int = 1


def _attn_params(key, q_dim, k_dim, v_dim, h):
    ks = jax.random.split(key, 5)
    scale = 1.0 / jnp.sqrt(h // 4)
    n = lambda k, shape: jax.random.normal(k, shape) * scale
    return {
        "q": n(ks[0], (q_dim, h)),
        "k": n(ks[1], (k_dim, h)),
        "v": n(ks[2], (v_dim, h)),
        "o": n(ks[3], (h, q_dim)),
        "g_w": n(ks[4], (2 * q_dim, q_dim)),
        "g_b": jnp.ones((q_dim,)),  # gate starts open (pass-through)
        "ln_q": (jnp.ones(q_dim), jnp.zeros(q_dim)),
        "ln_k": (jnp.ones(k_dim), jnp.zeros(k_dim)),
        "ln_v": (jnp.ones(v_dim), jnp.zeros(v_dim)),
    }


def init_diamnet(key, cfg: DIAMNetConfig):
    ks = jax.random.split(key, 6)
    h = cfg.hidden_dim
    scale = 1.0 / jnp.sqrt(h)
    n = lambda k, shape: jax.random.normal(k, shape) * scale
    return {
        "g_layer": (n(ks[0], (cfg.graph_dim, h)), jnp.zeros(h)),
        "p_attn": _attn_params(ks[1], h, cfg.pattern_dim, cfg.pattern_dim, h),
        "g_attn": _attn_params(ks[2], h, cfg.graph_dim, cfg.graph_dim, h),
        "pred1": (n(ks[3], (cfg.mem_len * h + 4, h)), jnp.zeros(h)),
        "pred2": (jnp.zeros((h + 4, 1)), jnp.zeros(1)),
    }


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def gated_mha(p, q, k, v, k_mask, num_heads: int):
    """Gated pre-LN multi-head attention (DIAMNet.py:469-598).

    q: [B, M, Dq]; k/v: [B, L, Dk]; k_mask: [B, L] (1 = valid).
    """
    b, m, dq = q.shape
    ln_q = _layer_norm(q, *p["ln_q"])
    ln_k = _layer_norm(k, *p["ln_k"])
    ln_v = _layer_norm(v, *p["ln_v"])
    h = p["q"].shape[1]
    hd = h // num_heads
    hq = (ln_q @ p["q"]).reshape(b, m, num_heads, hd)
    hk = (ln_k @ p["k"]).reshape(b, -1, num_heads, hd)
    hv = (ln_v @ p["v"]).reshape(b, -1, num_heads, hd)
    logits = jnp.einsum("bmnd,blnd->bnml", hq, hk) / jnp.sqrt(hd)
    logits = jnp.where(k_mask[:, None, None, :] > 0, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    vec = jnp.einsum("bnml,blnd->bmnd", attn, hv).reshape(b, m, h)
    out = vec @ p["o"]
    gate = jax.nn.sigmoid(
        jnp.concatenate([q, out], axis=-1) @ p["g_w"] + p["g_b"])
    return gate * q + (1.0 - gate) * out


def init_mem_mean(g, g_len, mem_len: int):
    """Strided mean-pool memory init (init_mem 'mean', DIAMNet.py:801-875)
    as a dense per-sample window-weight matrix.

    g: [B, L, D]; g_len: [B] actual lengths. Returns ([B, M, D], [B, M]).
    """
    b, L, d = g.shape
    m = mem_len
    lens = g_len.astype(jnp.int32)
    stride = lens // m                      # [B]
    kernel = lens - (m - 1) * stride        # [B]
    w_idx = jnp.arange(m)[None, :, None]    # [1, M, 1]
    l_idx = jnp.arange(L)[None, None, :]    # [1, 1, L]
    # len >= m: window w covers [w*stride, w*stride + kernel)
    lo = w_idx * stride[:, None, None]
    hi = lo + kernel[:, None, None]
    in_win = (l_idx >= lo) & (l_idx < hi)
    w_long = in_win / jnp.maximum(kernel[:, None, None], 1)
    # len < m: slot w takes element w (zero past the length)
    w_short = ((l_idx == w_idx) & (l_idx < lens[:, None, None])).astype(
        g.dtype)
    use_short = (lens < m)[:, None, None]
    W = jnp.where(use_short, w_short, w_long.astype(g.dtype))
    mem = jnp.einsum("bml,bld->bmd", W, g)
    mem_mask = jnp.where(lens[:, None] < m,
                         (jnp.arange(m)[None, :] < lens[:, None]),
                         True).astype(g.dtype)
    return mem, mem_mask


def apply_diamnet(params, cfg: DIAMNetConfig,
                  pattern, p_len, graph, g_len):
    """Forward (DIAMNet.py:119-200): returns [B, 1] predicted (log)
    counts.

    pattern: [B, Lp, Dp]; graph: [B, Lg, Dg]; *_len: [B] valid lengths.
    """
    b = pattern.shape[0]
    p_mask = (jnp.arange(pattern.shape[1])[None, :]
              < p_len[:, None]).astype(pattern.dtype)
    g_mask = (jnp.arange(graph.shape[1])[None, :]
              < g_len[:, None]).astype(graph.dtype)

    mem, mem_mask = init_mem_mean(graph, g_len, cfg.mem_len)
    gw, gb = params["g_layer"]
    mem = mem @ gw + gb

    for _ in range(cfg.recurrent_steps):
        mem = gated_mha(params["p_attn"], mem, pattern, pattern, p_mask,
                        cfg.num_heads)
        mem = gated_mha(params["g_attn"], mem, graph, graph, g_mask,
                        cfg.num_heads)

    plf = p_len.astype(jnp.float32)[:, None]
    glf = g_len.astype(jnp.float32)[:, None]
    feats = jnp.concatenate(
        [mem.reshape(b, -1), plf, glf, 1.0 / plf, 1.0 / glf], axis=-1)
    w1, b1 = params["pred1"]
    y = jax.nn.relu(feats @ w1 + b1)
    w2, b2 = params["pred2"]
    y = jnp.concatenate([y, plf, glf, 1.0 / plf, 1.0 / glf], axis=-1) @ w2 + b2
    return y
