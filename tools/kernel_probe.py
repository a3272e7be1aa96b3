"""Isolate where time goes INSIDE the merged-lane warp kernel.

Runs a stripped copy of ops/warp_pallas2._sample_kernel2 at per-stage bench
shapes with individual stages toggled off (band DMA only / +matmul / +wy mul /
+roll tree), timing each variant on the real TPU. The deltas attribute the
per-(tile,depth) microseconds to DMA vs MXU vs VPU — this decides whether the
fused-sweep kernel must change the vertical-combine algorithm or only amortize
DMA.

Usage: python tools/kernel_probe.py [--stage 2] [--n 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(
    vrow_ref, umin_ref, img_ref, uu_ref, vv_ref, feat_ref, out_ref, band_ref, sem,
    *, cb, RB, C, KT, mode,
):
    g = pl.program_id(0)
    G = pl.num_programs(0)
    L = RB * C
    P = uu_ref.shape[2]

    def dma(step, k, slot):
        i = step * KT + k
        um = pl.multiple_of(umin_ref[i], 8)
        vlane = pl.multiple_of(vrow_ref[i] * C, 128)
        return pltpu.make_async_copy(
            feat_ref.at[img_ref[i], pl.ds(um, cb), pl.ds(vlane, L)],
            band_ref.at[slot, k],
            sem.at[slot, k],
        )

    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        for k in range(KT):
            dma(g, k, slot).start()

    @pl.when(g + 1 < G)
    def _():
        for k in range(KT):
            dma(g + 1, k, nxt).start()

    x_idx = jax.lax.broadcasted_iota(jnp.int32, (P, cb), 1).astype(jnp.float32)
    r_ids = (jax.lax.broadcasted_iota(jnp.int32, (P, L), 1) // C).astype(jnp.float32)

    for k in range(KT):
        i = g * KT + k
        um = pl.multiple_of(umin_ref[i], 8)
        lu = uu_ref[0, k, :] - um.astype(jnp.float32)
        lv = vv_ref[0, k, :] - vrow_ref[i].astype(jnp.float32)

        dma(g, k, slot).wait()
        band = band_ref[slot, k]
        if mode == "dma":
            # touch the band minimally so nothing is DCE'd
            out_ref[0, k * P : (k + 1) * P, :] = (
                band[0:1, :C].astype(jnp.float32) + lu[:, None] + lv[:, None]
            ).astype(out_ref.dtype)
            continue
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu[:, None] - x_idx))
        hor = jax.lax.dot_general(
            wx.astype(band.dtype), band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "matmul":
            out_ref[0, k * P : (k + 1) * P, :] = hor[:, :C].astype(out_ref.dtype)
            continue
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(lv[:, None] - r_ids))
        s = hor * wy
        if mode == "wy":
            out_ref[0, k * P : (k + 1) * P, :] = s[:, :C].astype(out_ref.dtype)
            continue
        step = C
        while step < L:
            s = s + pltpu.roll(s, L - step, axis=1)
            step *= 2
        out_ref[0, k * P : (k + 1) * P, :] = s[:, :C].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cb", "RB", "C", "KT", "mode", "G", "Wp"))
def run_probe(vrow, umin, img, uu, vv, feat_m, *, cb, RB, C, KT, mode, G, Wp):
    P = uu.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, KT, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, KT, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, KT * P, C), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, KT, cb, RB * C), feat_m.dtype),
            pltpu.SemaphoreType.DMA((2, KT)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_probe_kernel, cb=cb, RB=RB, C=C, KT=KT, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, KT * P, C), jnp.float32),
    )(vrow, umin, img, uu, vv, feat_m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="depth slices per call")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    # per-stage bench shapes: (h, w, C) at 2752x1856 flagship geometry
    stages = {1: (688, 464, 32), 2: (1376, 928, 16), 3: (2752, 1856, 8)}
    tile_h, tile_w, KT = 8, 64, 4
    rng = np.random.RandomState(0)

    for si, (h, w, C) in stages.items():
        Lv = 128 // C
        RB = 32 if C == 8 else (32 if C == 16 else 32)  # matches pallas2 defaults
        cb = 128
        Hp = max(-(-h // Lv) * Lv, RB)
        Wp = max(-(-w // 8) * 8, cb)
        feat = rng.randn(1, Wp, Hp * C).astype(np.float32)
        feat_m = jnp.asarray(feat, dtype=jnp.bfloat16)

        N = args.n
        # smooth synthetic coords with mild motion, always in-band
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        u = (xs[None] + rng.rand(N, 1, 1) * 20).astype(np.float32)
        v = (ys[None] + rng.rand(N, 1, 1) * 6).astype(np.float32)
        u = np.clip(u, 0, w - 2)
        v = np.clip(v, 0, h - 2)

        ph = (-h) % tile_h
        pw = (-w) % (KT * tile_w)
        u = np.pad(u, ((0, 0), (0, ph), (0, pw)))
        v = np.pad(v, ((0, 0), (0, ph), (0, pw)))
        hp, wp = h + ph, w + pw
        nty, ntx = hp // tile_h, wp // tile_w
        P = tile_h * tile_w
        gx = ntx // KT
        G = N * nty * gx
        T = G * KT

        u5 = u.reshape(N, nty, tile_h, ntx, tile_w)
        v5 = v.reshape(N, nty, tile_h, ntx, tile_w)
        uu = jnp.asarray(u5.transpose(0, 1, 3, 2, 4).reshape(G, KT, P))
        vv = jnp.asarray(v5.transpose(0, 1, 3, 2, 4).reshape(G, KT, P))
        umin = np.clip(np.floor(u5.min(axis=(2, 4))), 0, Wp - cb)
        vmin = np.clip(np.floor(v5.min(axis=(2, 4))), 0, Hp - RB)
        umin = jnp.asarray(((umin.astype(np.int32) // 8) * 8).reshape(T))
        vrow = jnp.asarray(((vmin.astype(np.int32) // Lv) * Lv).reshape(T))
        img = jnp.zeros((T,), jnp.int32)

        print(f"--- stage{si}: {h}x{w} C={C} RB={RB} N={N} tiles/slice={nty*ntx}")
        prev = 0.0
        for mode in ("dma", "matmul", "wy", "full"):
            fn = lambda: run_probe(vrow, umin, img, uu, vv, feat_m,
                                   cb=cb, RB=RB, C=C, KT=KT, mode=mode, G=G, Wp=Wp)
            _ = float(jnp.sum(fn()))
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                r = fn()
                _ = float(jnp.sum(r))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            per_td = t / (N * nty * ntx) * 1e6
            print(f"  {mode:7s}: {t*1e3:8.2f} ms  ({per_td:6.2f} us/(tile*d))"
                  f"  delta={max(0, t-prev)*1e3:7.2f} ms")
            prev = t


if __name__ == "__main__":
    main()
