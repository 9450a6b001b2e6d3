"""Fused Pallas typed-aggregate kernel: semantic parity in interpret mode
(CPU-safe; the compiled TPU path is exercised separately — a hung kernel
wedges the shared chip, so hardware bring-up lives outside CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import desco_tpu.ops.pallas_segment as ps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(kernel, **kw):
        kw["interpret"] = True
        return orig(kernel, **kw)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)


def make_case(rng, N, T, H, E, pad=64):
    x = rng.standard_normal((N, H)).astype(np.float32)
    dst = rng.integers(0, N, E)
    typ = rng.integers(0, T, E)
    src = rng.integers(0, N, E)
    keys = dst * T + typ
    order = np.argsort(keys, kind="stable")
    keys, src = keys[order].astype(np.int32), src[order].astype(np.int32)
    dst, typ = dst[order], typ[order]
    keys = np.concatenate([keys, np.full(pad, N * T + 63, np.int32)])
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    w = rng.standard_normal((T, H, H)).astype(np.float32) * 0.1
    ref = np.zeros((N, H), np.float32)
    for e in range(E):
        ref[dst[e]] += x[src[e]] @ w[typ[e]]
    return x, src, keys, w, ref


def test_fused_kernel_matches_reference(rng):
    N, T, H, E = 256, 6, 64, 1024
    x, src, keys, w, ref = make_case(rng, N, T, H, E)
    out = np.asarray(ps.fused_typed_transform_aggregate(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(keys),
        jnp.asarray(w), T, N))
    # the fused path reduces messages in bf16 (f32 accumulate) — the
    # default TPU matmul precision; tolerance is bf16-level by design
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=2e-2)


def test_fused_kernel_vjp(rng):
    N, T, H, E = 128, 2, 64, 256
    x, src, keys, w, ref = make_case(rng, N, T, H, E)

    def f(x_, w_):
        return ps.fused_typed_transform_aggregate(
            x_, jnp.asarray(src), jnp.asarray(keys), w_, T, N).sum()

    gx, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    def ref_f(x_, w_):
        from desco_tpu.ops.segment import segment_sum

        msgs = jnp.take(x_, jnp.asarray(src), axis=0, fill_value=0.0)
        d = jnp.asarray((keys // T).astype(np.int32))
        t = jnp.asarray((keys % T).astype(np.int32))
        wt = jnp.take(w_, jnp.minimum(t, T - 1), axis=0)
        tm = jnp.einsum("eh,ehk->ek", msgs, wt)
        return segment_sum(tm * (d < N)[:, None], d, N).sum()

    gx2, gw2 = jax.grad(ref_f, argnums=(0, 1))(jnp.asarray(x),
                                               jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2), rtol=1e-3,
                               atol=1e-4)


def test_fused_kernel_vjp_perm_path(rng):
    """The fast (src,type)-keyed backward matches the XLA reference."""
    N, T, H, E = 128, 2, 64, 256
    x, src, keys, w, ref = make_case(rng, N, T, H, E)
    # padding edges must sort last (pack_samples guarantees this via
    # src = pad node; this synthetic case keys them explicitly)
    perm = np.lexsort((keys % T, src, keys >= N * T)).astype(np.int32)

    def f(x_, w_):
        return (ps.fused_typed_transform_aggregate(
            x_, jnp.asarray(src), jnp.asarray(keys), w_, T, N,
            bwd_perm=jnp.asarray(perm)) ** 2).sum()

    gx, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    def ref_f(x_, w_):
        from desco_tpu.ops.segment import segment_sum

        msgs = jnp.take(x_, jnp.asarray(src), axis=0, fill_value=0.0)
        d = jnp.asarray((keys // T).astype(np.int32))
        t = jnp.asarray((keys % T).astype(np.int32))
        wt = jnp.take(w_, jnp.minimum(t, T - 1), axis=0)
        tm = jnp.einsum("eh,ehk->ek", msgs, wt)
        return (segment_sum(tm * (d < N)[:, None], d, N) ** 2).sum()

    gx2, gw2 = jax.grad(ref_f, argnums=(0, 1))(jnp.asarray(x),
                                               jnp.asarray(w))
    # bf16-reduced cotangents vs the f32 XLA backward: compare error
    # relative to tensor scale (structural bugs — wrong src/type routing
    # — give order-1 relative-to-scale errors; bf16 noise stays ~1e-2)
    for a, d in ((gx, gx2), (gw, gw2)):
        a, d = np.asarray(a), np.asarray(d)
        rel = np.abs(a - d).max() / (np.abs(d).max() + 1e-9)
        assert rel < 2e-2, rel


# ------------------------- full SHMP core through the fused kernel path
def _packed_case(rng):
    import dataclasses

    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.models.shmp_gnn import (
        init_shmp, neighborhood_target_config,
    )
    from test_models import make_neigh_samples

    samples = make_neigh_samples(rng, n_graphs=5)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    [b] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     output_dim=8)
    cfg_p = dataclasses.replace(cfg, agg_mode="pallas")
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    return b, cfg, cfg_p, params


def test_shmp_core_pallas_matches_xla(rng):
    from desco_tpu.models.shmp_gnn import apply_shmp_core

    b, cfg, cfg_p, params = _packed_case(rng)
    ref = np.asarray(apply_shmp_core(params, cfg, b))
    out = np.asarray(apply_shmp_core(params, cfg_p, b))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-2)


def test_shmp_core_pallas_grads_match(rng):
    from desco_tpu.models.shmp_gnn import apply_shmp_core

    b, cfg, cfg_p, params = _packed_case(rng)

    def loss(p, c):
        return (apply_shmp_core(p, c, b) ** 2).sum()

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)
    g_out = jax.grad(lambda p: loss(p, cfg_p))(params)
    jax.tree_util.tree_map(
        # loose: grads compare a bf16-reduced forward against the f32
        # XLA forward; structural bugs (wrong edge/type routing) give
        # order-1 errors, precision noise stays under a few percent
        lambda a, r: np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=8e-2, atol=3e-2),
        g_out, g_ref)


def test_shmp_core_cumsum_matches_xla(rng):
    """agg_mode='cumsum' (prefix-sum + boundary gather, ops/segment.py)
    == the scatter path, forward and grads (all-f32: tight tolerance)."""
    import dataclasses

    from desco_tpu.models.shmp_gnn import apply_shmp_core

    b, cfg, _, params = _packed_case(rng)
    cfg_c = dataclasses.replace(cfg, agg_mode="cumsum")
    ref = np.asarray(apply_shmp_core(params, cfg, b))
    out = np.asarray(apply_shmp_core(params, cfg_c, b))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def loss(p, c):
        return (apply_shmp_core(p, c, b) ** 2).sum()

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)
    g_out = jax.grad(lambda p: loss(p, cfg_c))(params)
    jax.tree_util.tree_map(
        lambda a, d: np.testing.assert_allclose(
            np.asarray(a), np.asarray(d), rtol=1e-3, atol=1e-3),
        g_out, g_ref)


def test_sorted_segment_sum_ad_value_and_grad(rng):
    """The differentiable wrapper (halo-path routing): forward == XLA
    segment_sum at bf16 tolerance, VJP == cotangent gather by segment id
    (exact — the backward is plain XLA)."""
    E, N, K = 640, 256, 48
    seg = np.sort(rng.integers(0, N, E)).astype(np.int32)
    seg[-32:] = N + 7  # padding tail (dropped)
    msgs = rng.standard_normal((E, K)).astype(np.float32)

    out = np.asarray(ps.sorted_segment_sum_ad(
        jnp.asarray(msgs), jnp.asarray(seg), N))
    ref = np.zeros((N, K), np.float32)
    for e in range(E):
        if seg[e] < N:
            ref[seg[e]] += msgs[e]
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=2e-2)

    g = rng.standard_normal((N, K)).astype(np.float32)

    def f(m):
        return (ps.sorted_segment_sum_ad(m, jnp.asarray(seg), N)
                * jnp.asarray(g)).sum()

    dm = np.asarray(jax.grad(f)(jnp.asarray(msgs)))
    ref_dm = np.where((seg < N)[:, None], g[np.minimum(seg, N - 1)], 0.0)
    np.testing.assert_allclose(dm, ref_dm, rtol=1e-6, atol=1e-6)


def test_out_struct_vma_propagates(rng):
    """jax 0.9 shard_map(check_vma=True) rejects pallas outputs whose
    ShapeDtypeStruct lacks the varying-across-mesh set (found by
    scripts/halo_on_chip.py on the first real-TPU lowering of the halo
    path). _out_struct must union the operands' vma so the kernel
    traces inside shard_map; the Mosaic-path execution proof lives in
    the hardware script (interpret mode has a separate upstream vma bug
    in its dynamic_slice emulation, so it cannot execute here)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    seen = {}

    @partial(jax.shard_map, mesh=mesh, in_specs=P("graph"),
             out_specs=P("graph"))
    def probe(x):
        s = ps._out_struct((4, 128), x[0])
        seen["vma"] = getattr(jax.typeof(x[0]), "vma", None)
        seen["out_vma"] = getattr(s, "vma", None)
        return x

    with mesh:
        jax.eval_shape(probe, jnp.zeros((1, 8, 128)))
    assert seen["vma"] == frozenset({"graph"})
    assert seen["out_vma"] == frozenset({"graph"})
    # outside shard_map the vma is empty and the struct still builds
    s = ps._out_struct((4, 128), jnp.zeros((8, 128)))
    assert getattr(s, "vma", frozenset()) == frozenset()


@pytest.mark.parametrize("use_perm", [False, True])
def test_bf16_grads_through_pallas_path(rng, use_perm):
    """bf16 training on TPU takes the Pallas path: custom-VJP cotangents
    must come back in the PRIMAL dtypes (jax rejects f32 cotangents for
    bf16 primals) and track the f32 gradients within bf16 error. CPU
    tests run the XLA fallback, so without this interpret-mode gate the
    combination would first fail on hardware mid-training."""
    N, T, H, E = 128, 6, 64, 512
    x, src, keys, w, _ = make_case(rng, N, T, H, E)
    xd, sd, kd, wd = map(jnp.asarray, (x, src, keys, w))
    perm = (jnp.asarray(np.lexsort(((keys % T), src)).astype(np.int32))
            if use_perm else None)

    def loss(x_, w_):
        o = ps.fused_typed_transform_aggregate(
            x_, sd, kd, w_, T, N, bwd_perm=perm)
        return 0.5 * jnp.sum(o.astype(jnp.float32) ** 2)

    g32 = jax.grad(loss, argnums=(0, 1))(xd, wd)
    gbf = jax.grad(loss, argnums=(0, 1))(
        xd.astype(jnp.bfloat16), wd.astype(jnp.bfloat16))
    assert gbf[0].dtype == jnp.bfloat16
    assert gbf[1].dtype == jnp.bfloat16
    for a, b in zip(gbf, g32):
        aa, bb = np.asarray(a, np.float32), np.asarray(b)
        denom = max(np.abs(bb).max(), 1e-6)
        assert np.abs(aa - bb).max() / denom < 0.05


def test_segsum_v2_matches_v1(rng, monkeypatch):
    """DESCO_SEG_V2=1 (VMEM-resident keys) computes the same sums as
    the chunked v1 kernel, and the VMEM budget guard falls back to v1
    for edge streams whose key array would not fit."""
    E, N = 1024, 512
    seg = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msgs = rng.standard_normal((E, 128)).astype(np.float32)
    md, sd = jnp.asarray(msgs), jnp.asarray(seg)

    monkeypatch.setenv("DESCO_SEG_V2", "0")  # v2 is the default now
    ref = np.asarray(ps.pallas_sorted_segment_sum(md, sd, N))
    monkeypatch.setenv("DESCO_SEG_V2", "1")
    out = np.asarray(ps.pallas_sorted_segment_sum(md, sd, N))
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=2e-2)

    # guard: a (hypothetically) huge stream must take the v1 path even
    # with the flag on — spy on which kernel function pallas_call gets
    seen = []
    inner = ps.pl.pallas_call  # the fixture's interpret wrapper

    def spying(kernel, **kw):
        seen.append(getattr(kernel, "func", kernel).__name__)
        return inner(kernel, **kw)

    monkeypatch.setattr(ps.pl, "pallas_call", spying)
    jax.eval_shape(lambda m, s: ps.pallas_sorted_segment_sum(m, s, N),
                   md, sd)
    assert seen[-1] == "_segsum_kernel_v2"
    big_e = 4 * 2 ** 20  # 16 MiB of keys > the 10 MiB budget
    big = jax.ShapeDtypeStruct((big_e, 128), jnp.float32)
    bigseg = jax.ShapeDtypeStruct((big_e,), jnp.int32)
    jax.eval_shape(lambda m, s: ps.pallas_sorted_segment_sum(m, s, N),
                   big, bigseg)
    assert seen[-1] == "_segsum_kernel"


def test_smoke_f64_truth_matches_cpu_autodiff(rng):
    """The hardware smoke's host-side f64 reference (_f64_truth in
    scripts/pallas_bringup.py) must agree with jax.grad of the same
    XLA composite on CPU — where XLA compiles the backward correctly.
    (On the axon TPU platform the fused backward composite miscompiles,
    which is exactly why the smoke carries its own host reference; this
    test pins the reference itself.)"""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from pallas_bringup import _f64_truth, make_case as smoke_case, \
        xla_ref_jnp

    N, T, H, E = 256, 6, 64, 2048
    x, src, keys, w = smoke_case(np.random.default_rng(3), N, T, H, E)
    o_t, dx_t, dw_t = _f64_truth(x, src, keys, w, T, N)
    sd, kd = jnp.asarray(src), jnp.asarray(keys)

    def loss(x_, w_):
        o = xla_ref_jnp(x_, sd, kd, w_, T, N)
        return 0.5 * jnp.sum(o * o)

    o_c = np.asarray(xla_ref_jnp(jnp.asarray(x), sd, kd, jnp.asarray(w),
                                 T, N))
    dx_c, dw_c = [np.asarray(v) for v in jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))]
    for name, a, b in (("o", o_t, o_c), ("dx", dx_t, dx_c),
                       ("dw", dw_t, dw_c)):
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        assert err < 1e-4, (name, err)
