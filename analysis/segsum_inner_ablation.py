"""Which part of the Pallas segment-sum kernel costs: time stripped
variants of the inner loop on the real bench edge stream.

Variants (all same DMA pattern / grid; some produce WRONG results — this
is a timing probe, not a correctness harness):

  full      — the pre-optimization kernel structure ([2,...] slot-indexed
              scratch, in-kernel min/max window chain) — the baseline the
              scalar-prefetched window-bounds change was measured against;
              the SHIPPED kernel (ops/pallas_segment.py) prefetches
              per-group window bounds and splits the double buffers
  nowin     — window min/max reduce chain removed (off=0 fast path always)
  nohot     — nowin + one-hot build replaced by a constant P (matmul+RMW)
  nomm      — DMA + acc zero only (the DMA floor)

Usage: python analysis/segsum_inner_ablation.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_workload
    from desco_tpu.ops.pallas_segment import (
        CE, GSZ, LANES, SEG_TILE, pallas_sorted_segment_sum,
    )

    batch, _ = build_workload()
    t_n = 6
    n = batch.n_cap
    keys = (np.asarray(batch.edge_dst, np.int64) * t_n
            + np.asarray(batch.edge_type, np.int64))
    dst = (keys // t_n).astype(np.int32)
    dst[keys >= n * t_n] = 2 ** 30
    e = dst.shape[0]
    key = jax.random.PRNGKey(0)
    msgs = jax.random.normal(key, (e, LANES), jnp.bfloat16)
    dstj = jnp.asarray(dst)

    seg_tile, ce, gsz = SEG_TILE, CE, GSZ
    ks = ce // 128
    gs = gsz // 128

    def make_kernel(mode):
        def kern(offs_ref, seg_hbm, msgs_hbm, out_ref,
                 acc_ref, sbuf, mbuf, sem_s, sem_m):
            i = pl.program_id(0)
            base = i * seg_tile
            lo = offs_ref[i]
            hi = offs_ref[i + 1]
            acc_ref[:] = jnp.zeros_like(acc_ref)
            c0 = lo // ce
            c1 = (hi + ce - 1) // ce

            def get_dma(slot, c):
                return (
                    pltpu.make_async_copy(
                        seg_hbm.at[c], sbuf.at[slot], sem_s.at[slot]),
                    pltpu.make_async_copy(
                        msgs_hbm.at[pl.ds(c * ce, ce), :], mbuf.at[slot],
                        sem_m.at[slot]),
                )

            @pl.when(c0 < c1)
            def _():
                for d in get_dma(0, c0):
                    d.start()

            rows256 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
            rows_full = jax.lax.broadcasted_iota(
                jnp.int32, (seg_tile, 128), 0)

            def one_hot(rels, rows):
                cols = [(rows == r[None, :]).astype(jnp.bfloat16)
                        for r in rels]
                return cols[0] if len(cols) == 1 else jnp.concatenate(
                    cols, 1)

            const_p = None

            def chunk_body(c, _):
                slot = (c - c0) % 2

                @pl.when(c + 1 < c1)
                def _():
                    for d in get_dma((c - c0 + 1) % 2, c + 1):
                        d.start()

                for d in get_dma(slot, c):
                    d.wait()

                for g in range(ce // gsz):
                    m = mbuf[slot, g * gsz:(g + 1) * gsz, :]
                    if mode == "nomm":
                        acc_ref[0:1, 0:1] += m[0:1, 0:1].astype(
                            jnp.float32)
                        continue
                    if mode == "nohot":
                        p0 = jnp.full((256, gsz), 0.001, jnp.bfloat16)
                        acc_ref[pl.ds(0, 256)] += jax.lax.dot_general(
                            p0, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        continue
                    rels = [sbuf[slot, g * gs + j, :] - base
                            for j in range(gs)]
                    if mode == "nowin":
                        p0 = one_hot(rels, rows256)
                        acc_ref[pl.ds(0, 256)] += jax.lax.dot_general(
                            p0, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        continue
                    t_lo = [jnp.clip(r, 0, seg_tile - 1) // 128
                            for r in rels]
                    t_a = jnp.min(jnp.stack([jnp.min(t) for t in t_lo]))
                    t_b = jnp.max(jnp.stack([jnp.max(t) for t in t_lo]))

                    @pl.when(t_b <= t_a + 1)
                    def _():
                        off = jnp.minimum(t_a * 128, seg_tile - 256)
                        p0 = one_hot([r - off for r in rels], rows256)
                        acc_ref[pl.ds(off, 256)] += jax.lax.dot_general(
                            p0, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    @pl.when(t_b > t_a + 1)
                    def _():
                        p = one_hot(rels, rows_full)
                        acc_ref[:] += jax.lax.dot_general(
                            p, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(c0, c1, chunk_body, 0)
            out_ref[:] = acc_ref[:]
        return kern

    n_pad = ((n + seg_tile - 1) // seg_tile) * seg_tile
    n_tiles = n_pad // seg_tile
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * seg_tile
    e_pad = ((e + ce - 1) // ce) * ce
    seg2 = dstj.astype(jnp.int32)
    if e_pad != e:
        seg2 = jnp.concatenate(
            [seg2, jnp.full((e_pad - e,), np.int32(2 ** 30), jnp.int32)])
    offs = jnp.searchsorted(seg2, bounds,
                            method="scan_unrolled").astype(jnp.int32)
    seg2 = seg2.reshape(e_pad // ce, ks, 128)
    msgs2 = jnp.zeros((e_pad, LANES), jnp.bfloat16).at[:e].set(msgs)

    def run(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((seg_tile, LANES), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((seg_tile, LANES), jnp.float32),
                pltpu.VMEM((2, ks, 128), jnp.int32),
                pltpu.VMEM((2, ce, LANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(mode), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32))

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        _ = np.asarray(out)
        per = (time.perf_counter() - t0) / 5
        iters = max(20, int(0.6 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _ = np.asarray(out)
            reps.append((time.perf_counter() - t0) / iters)
        return sorted(reps)[1]

    # 8 kernel calls back-to-back inside one jit (mirrors the 8 layers,
    # cancels dispatch)
    for mode in ["full", "nowin", "nohot", "nomm"]:
        k = run(mode)

        @jax.jit
        def eight(offs, seg2, msgs2, k=k):
            out = 0.0
            for _ in range(8):
                out = out + k(offs, seg2, msgs2).sum()
            return out

        dt = timeit(eight, offs, seg2, msgs2)
        print(f"{mode:>6}: {dt * 1e3:7.3f} ms / 8 calls "
              f"({dt / 8 * 1e6:6.1f} us per call)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
