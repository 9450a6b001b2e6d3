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
  * mem_init 'mean' (the paper's config) plus 'sum'/'max'/'attn'/'lstm'
    (DIAMNet.py:801-921): the strided windows become static [B, M, L]
    membership masks; attn runs one gated-MHA step per window with the
    window as the key mask; lstm runs a masked lax.scan over the padded
    sequence per window (the carry crosses windows, as in the torch
    loop); circular_mean/sum/max extend the sequence circularly by
    ceil((len+1)/2)-1 positions first (DIAMNet.py:846-861), expressed
    as a per-sample window-COUNT matrix over original indices (a
    wrap-spanning window counts an index twice, like the torch pooling
    over the padded copy); circular_attn/circular_lstm run the same
    attn/lstm window loops over an explicitly materialized circular
    extension (gather by e % len) — all ten reference variants
    (DIAMNet.py:802-813) are implemented.

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
    # mean | sum | max | attn | lstm | circular_{mean,sum,max,attn,lstm}
    mem_init: str = "mean"


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
    ks = jax.random.split(key, 8)
    h = cfg.hidden_dim
    scale = 1.0 / jnp.sqrt(h)
    n = lambda k, shape: jax.random.normal(k, shape) * scale
    params = {
        "g_layer": (n(ks[0], (cfg.graph_dim, h)), jnp.zeros(h)),
        "p_attn": _attn_params(ks[1], h, cfg.pattern_dim, cfg.pattern_dim, h),
        "g_attn": _attn_params(ks[2], h, cfg.graph_dim, cfg.graph_dim, h),
        "pred1": (n(ks[3], (cfg.mem_len * h + 4, h)), jnp.zeros(h)),
        "pred2": (jnp.zeros((h + 4, 1)), jnp.zeros(1)),
    }
    if cfg.mem_init.endswith("attn"):
        # window self-attention for the memory init (init_mem 'attn' /
        # 'circular_attn', DIAMNet.py:874-897); queries live in hidden
        # space, keys/values are raw graph features
        params["mem_attn"] = _attn_params(
            ks[6], h, cfg.graph_dim, cfg.graph_dim, h)
    elif cfg.mem_init.endswith("lstm"):
        # single-layer LSTM over window elements (init_mem 'lstm',
        # DIAMNet.py:898-906)
        params["mem_lstm"] = {
            "wi": n(ks[6], (cfg.graph_dim, 4 * h)),
            "wh": n(ks[7], (h, 4 * h)),
            "b": jnp.zeros(4 * h),
        }
    return params


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


def _mem_windows(g_len, L: int, m: int):
    """Strided-window geometry shared by all mem_init variants
    (DIAMNet.py:857-859): per-sample stride/kernel and the static
    [B, M, L] window-membership mask (len >= m regime)."""
    lens = g_len.astype(jnp.int32)
    stride = lens // m                      # [B]
    kernel = lens - (m - 1) * stride        # [B]
    w_idx = jnp.arange(m)[None, :, None]    # [1, M, 1]
    l_idx = jnp.arange(L)[None, None, :]    # [1, 1, L]
    lo = w_idx * stride[:, None, None]
    hi = lo + kernel[:, None, None]
    in_win = (l_idx >= lo) & (l_idx < hi)
    return in_win, kernel, lens


def _mem_short(g, lens, m: int):
    """len < m fallback: slot w takes element w, zero past the length
    (DIAMNet.py:821-844)."""
    L = g.shape[1]
    w_idx = jnp.arange(m)[None, :, None]
    l_idx = jnp.arange(L)[None, None, :]
    w_short = ((l_idx == w_idx) & (l_idx < lens[:, None, None])).astype(
        g.dtype)
    return jnp.einsum("bml,bld->bmd", w_short, g)


def _mem_mask(lens, m: int, dtype):
    return jnp.where(lens[:, None] < m,
                     (jnp.arange(m)[None, :] < lens[:, None]),
                     True).astype(dtype)


def init_mem_mean(g, g_len, mem_len: int):
    """Strided mean-pool memory init (init_mem 'mean', DIAMNet.py:801-875)
    as a dense per-sample window-weight matrix.

    g: [B, L, D]; g_len: [B] actual lengths. Returns ([B, M, D], [B, M]).
    """
    m = mem_len
    in_win, kernel, lens = _mem_windows(g_len, g.shape[1], m)
    w_long = (in_win / jnp.maximum(kernel[:, None, None], 1)).astype(g.dtype)
    mem_long = jnp.einsum("bml,bld->bmd", w_long, g)
    use_short = (lens < m)[:, None, None]
    mem = jnp.where(use_short, _mem_short(g, lens, m), mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


def init_mem_sum(g, g_len, mem_len: int):
    """init_mem 'sum' (DIAMNet.py:869-875): windowed sum."""
    m = mem_len
    in_win, _, lens = _mem_windows(g_len, g.shape[1], m)
    mem_long = jnp.einsum("bml,bld->bmd", in_win.astype(g.dtype), g)
    use_short = (lens < m)[:, None, None]
    mem = jnp.where(use_short, _mem_short(g, lens, m), mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


def init_mem_max(g, g_len, mem_len: int):
    """init_mem 'max' (DIAMNet.py:865-868): windowed max-pool."""
    m = mem_len
    in_win, _, lens = _mem_windows(g_len, g.shape[1], m)
    neg = jnp.asarray(-jnp.inf, g.dtype)
    masked = jnp.where(in_win[..., None], g[:, None, :, :], neg)
    mem_long = masked.max(axis=2)
    mem_long = jnp.where(jnp.isfinite(mem_long), mem_long, 0.0)
    use_short = (lens < m)[:, None, None]
    mem = jnp.where(use_short, _mem_short(g, lens, m), mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


def init_mem_circular(g, g_len, mem_len: int, kind: str = "mean"):
    """init_mem 'circular_mean' / 'circular_sum' / 'circular_max'
    (DIAMNet.py:846-876): the sequence is first extended CIRCULARLY by
    pad = ceil((len+1)/2) - 1 positions (F.pad mode='circular'), then
    the same strided windows pool over the extended stream.

    Dense formulation: extended position e maps to original index
    e % len, so the window weight matrix counts, per (window, original
    index), how many extended positions land there (a window that spans
    the wrap touches an index up to twice — circular_sum counts it
    twice, exactly like the torch pooling over the padded copy).
    len == mem_len bypasses the circular pad entirely (the torch
    seq_len == mem_len branch); len < mem_len takes the short fallback.
    circular_attn / circular_lstm live in init_mem_attn/init_mem_lstm
    (circular=True) over the materialized extension."""
    b, L, _ = g.shape
    m = mem_len
    lens = g_len.astype(jnp.int32)
    pad = jnp.ceil((lens + 1) / 2).astype(jnp.int32) - 1
    ext = lens + pad                          # per-sample extended length
    L_ext = L + (L + 1) // 2                  # static cap
    stride = ext // m
    kernel = ext - (m - 1) * stride

    e_idx = jnp.arange(L_ext)[None, None, :]             # [1, 1, Le]
    w_idx = jnp.arange(m)[None, :, None]                 # [1, M, 1]
    lo = w_idx * stride[:, None, None]
    hi = lo + kernel[:, None, None]
    in_win = ((e_idx >= lo) & (e_idx < hi)
              & (e_idx < ext[:, None, None]))            # [B, M, Le]
    # e -> e % len one-hot (valid extended positions only)
    e2 = jnp.arange(L_ext)[None, :]                      # [1, Le]
    orig = e2 % jnp.maximum(lens[:, None], 1)            # [B, Le]
    onehot = (orig[:, :, None] == jnp.arange(L)[None, None, :]) & (
        e2 < ext[:, None])[:, :, None]                   # [B, Le, L]
    cnt = jnp.einsum("bme,bel->bml", in_win.astype(g.dtype),
                     onehot.astype(g.dtype))             # [B, M, L]
    if kind == "mean":
        w = cnt / jnp.maximum(kernel[:, None, None], 1).astype(g.dtype)
        mem_long = jnp.einsum("bml,bld->bmd", w, g)
    elif kind == "sum":
        mem_long = jnp.einsum("bml,bld->bmd", cnt, g)
    else:  # max: membership only (multiplicity is irrelevant)
        neg = jnp.asarray(-jnp.inf, g.dtype)
        masked = jnp.where((cnt > 0)[..., None], g[:, None, :, :], neg)
        mem_long = masked.max(axis=2)
        mem_long = jnp.where(jnp.isfinite(mem_long), mem_long, 0.0)
    use_short = (lens <= m)[:, None, None]   # == m bypasses circular pad
    mem = jnp.where(use_short, _mem_short(g, lens, m), mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


def _circular_extend(g, g_len):
    """Materialize the circularly padded sequence of init_mem's
    circular variants (DIAMNet.py:846-856) with static shapes:
    ext_g[b, e] = g[b, e % len] for e < len + pad (pad =
    ceil((len+1)/2) - 1), zero beyond. Returns (ext_g [B, Le, D],
    in_win [B, M_CAP-free window mask builder inputs]): callers derive
    windows from the EXTENDED length."""
    b, L, _ = g.shape
    lens = g_len.astype(jnp.int32)
    pad = jnp.ceil((lens + 1) / 2).astype(jnp.int32) - 1
    ext = lens + pad
    L_ext = L + (L + 1) // 2
    e2 = jnp.arange(L_ext)[None, :]
    orig = e2 % jnp.maximum(lens[:, None], 1)
    ext_g = jnp.take_along_axis(
        g, jnp.minimum(orig, L - 1)[:, :, None], axis=1)
    ext_g = jnp.where((e2 < ext[:, None])[:, :, None], ext_g, 0.0)
    return ext_g, ext


def _windows_from_len(lens, L: int, m: int):
    """[B, M, L] strided-window membership for given (possibly
    extended) lengths — delegates to _mem_windows so the stride/kernel
    rule (DIAMNet.py:857-858) lives in exactly one place. (No extra
    ``l_idx < lens`` clamp is needed: every window's hi = lo + kernel
    <= (m-1)*stride + kernel = lens.)"""
    return _mem_windows(lens, L, m)[0]


def init_mem_attn(params, cfg, g, g_len, circular: bool = False):
    """init_mem 'attn' / 'circular_attn' (DIAMNet.py:874-897): one
    gated-MHA step per strided window, the query carrying across
    windows (h starts at 1/sqrt(h)); each step's output is one memory
    slot. Output lives in hidden space (no g_layer projection
    afterwards). circular_attn (DIAMNet.py:846-856) first extends the
    sequence circularly by ceil((len+1)/2)-1 positions and windows the
    extended stream."""
    m = cfg.mem_len
    h_dim = cfg.hidden_dim
    lens = g_len.astype(jnp.int32)
    if circular:
        keys, ext = _circular_extend(g, g_len)
        in_win = _windows_from_len(ext, keys.shape[1], m)
    else:
        keys = g
        in_win, _, _ = _mem_windows(g_len, g.shape[1], m)
    h = jnp.full((g.shape[0], 1, h_dim), 1.0 / jnp.sqrt(h_dim), g.dtype)
    slots = []
    for w in range(m):
        h = gated_mha(params["mem_attn"], h, keys, keys,
                      in_win[:, w, :].astype(g.dtype), cfg.num_heads)
        slots.append(h)
    mem_long = jnp.concatenate(slots, axis=1)            # [B, M, H]
    gw, gb = params["g_layer"]
    # len == m bypasses the circular pad (torch seq_len == mem_len
    # branch returns x before the circular machinery)
    use_short = ((lens <= m) if circular else (lens < m))[:, None, None]
    mem = jnp.where(use_short, _mem_short(g, lens, m) @ gw + gb, mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


def init_mem_lstm(params, cfg, g, g_len, circular: bool = False):
    """init_mem 'lstm' / 'circular_lstm' (DIAMNet.py:898-906): an LSTM
    consumes each window's elements; the hidden state after window w is
    memory slot w and the carry crosses windows (torch loops
    `_, hx = lstm(m, hx)`). circular_lstm scans the circularly extended
    sequence (DIAMNet.py:846-856)."""
    m = cfg.mem_len
    h_dim = cfg.hidden_dim
    b = g.shape[0]
    lens = g_len.astype(jnp.int32)
    if circular:
        g_seq, ext = _circular_extend(g, g_len)
        in_win = _windows_from_len(ext, g_seq.shape[1], m)
    else:
        g_seq = g
        in_win, _, _ = _mem_windows(g_len, g.shape[1], m)
    p = params["mem_lstm"]

    def step(carry, inp):
        h, c = carry
        x_l, valid = inp                                  # [B, D], [B]
        gates = x_l @ p["wi"] + h @ p["wh"] + p["b"]
        i, f, gg, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        v = valid[:, None]
        return (jnp.where(v, h_new, h), jnp.where(v, c_new, c)), None

    carry = (jnp.zeros((b, h_dim), g.dtype), jnp.zeros((b, h_dim), g.dtype))
    slots = []
    xs_feat = jnp.swapaxes(g_seq, 0, 1)                   # [L(e), B, D]
    for w in range(m):
        valid = jnp.swapaxes(in_win[:, w, :], 0, 1)       # [L(e), B]
        carry, _ = jax.lax.scan(step, carry, (xs_feat, valid))
        slots.append(carry[0][:, None, :])
    mem_long = jnp.concatenate(slots, axis=1)             # [B, M, H]
    gw, gb = params["g_layer"]
    use_short = ((lens <= m) if circular else (lens < m))[:, None, None]
    mem = jnp.where(use_short, _mem_short(g, lens, m) @ gw + gb, mem_long)
    return mem, _mem_mask(lens, m, g.dtype)


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

    if cfg.mem_init.endswith("attn"):
        mem, mem_mask = init_mem_attn(
            params, cfg, graph, g_len,
            circular=cfg.mem_init.startswith("circular"))
    elif cfg.mem_init.endswith("lstm"):
        mem, mem_mask = init_mem_lstm(
            params, cfg, graph, g_len,
            circular=cfg.mem_init.startswith("circular"))
    elif cfg.mem_init.startswith("circular_"):
        mem, mem_mask = init_mem_circular(
            graph, g_len, cfg.mem_len, cfg.mem_init.split("_", 1)[1])
        gw, gb = params["g_layer"]
        mem = mem @ gw + gb
    else:
        pool = {"mean": init_mem_mean, "sum": init_mem_sum,
                "max": init_mem_max}[cfg.mem_init]
        mem, mem_mask = pool(graph, g_len, cfg.mem_len)
        gw, gb = params["g_layer"]
        mem = mem @ gw + gb

    for _ in range(cfg.recurrent_steps):
        mem = gated_mha(params["p_attn"], mem, pattern, pattern, p_mask,
                        cfg.num_heads)
        mem = gated_mha(params["g_attn"], mem, graph, graph, g_mask,
                        cfg.num_heads)

    plf = p_len.astype(jnp.float32)[:, None]
    glf = g_len.astype(jnp.float32)[:, None]
    # 1/len features (DIAMNet.py:188-192) with a safe denominator:
    # PADDING graphs in a packed batch have length 0, and an inf here
    # poisons the whole batch loss through 0 * inf = NaN (pad rows are
    # masked in the loss, but NaN ignores the mask)
    feats = jnp.concatenate(
        [mem.reshape(b, -1), plf, glf,
         1.0 / jnp.maximum(plf, 1.0), 1.0 / jnp.maximum(glf, 1.0)],
        axis=-1)
    w1, b1 = params["pred1"]
    y = jax.nn.relu(feats @ w1 + b1)
    w2, b2 = params["pred2"]
    y = jnp.concatenate(
        [y, plf, glf,
         1.0 / jnp.maximum(plf, 1.0), 1.0 / jnp.maximum(glf, 1.0)],
        axis=-1) @ w2 + b2
    return y
