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
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


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
