"""Time the one-call fused sweep kernels (ops/sweep_fuse.py) on the real TPU
at per-stage flagship bench shapes (2752x1856, D=48/32/8, 4 source views).

Per stage prints: fused-volume build time, achieved TFLOP/s (hor-matmul
count), band HBM GB, and — with --parity — on-device max/mean error vs the
exact XLA gather composition on a downsampled window.

Usage: python tools/sweepfuse_probe.py [--stages 1,2,3] [--d_chunk 16]
       [--row_band 12] [--iters 3] [--parity]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def stage_case(si, H, W, views, rng):
    """Bench-geometry stage case: (h, w, C, D, src_feats, projs, lo, step)."""
    s = 2 ** (3 - si)
    h, w = H // s, W // s
    C = {1: 32, 2: 16, 3: 8}[si]
    D = {1: 48, 2: 32, 3: 8}[si]
    Vs = views - 1
    proj = np.tile(np.eye(4, dtype=np.float32), (views, 1, 1, 1))
    for v in range(views):
        proj[v, :, 0, 0] = 2200.0 / s
        proj[v, :, 1, 1] = 2200.0 / s
        proj[v, :, 0, 2] = w / 2
        proj[v, :, 1, 2] = h / 2
        proj[v, :, 0, 3] = 2200.0 / s * 10.0 * v
    ref_proj = jnp.asarray(proj[0])
    src_projs = jnp.asarray(proj[1:])
    ref_feat = jnp.asarray(rng.randn(1, h, w, C).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(Vs, 1, h, w, C).astype(np.float32))
    weights = jnp.asarray(rng.rand(1, h, w, Vs).astype(np.float32))
    if si == 1:
        lo = jnp.full((1, h, w), 300.0)
        step = jnp.full((1, h, w), (500.0 - 300.0) / (D - 1))
    else:
        # stage>=2: narrow window around a plausible smooth depth map
        base = np.linspace(320.0, 470.0, w, dtype=np.float32)[None, None, :]
        prev = np.broadcast_to(base, (1, h, w)) + rng.randn(1, h, w) * 2.0
        itv = {2: 2.083, 3: 1.042}[si]  # depth_inter_r * (dmax-dmin)/192
        lo = jnp.asarray((prev - D / 2 * itv).astype(np.float32))
        step = jnp.full((1, h, w), itv)
    return h, w, C, D, ref_feat, src_feats, src_projs, ref_proj, weights, lo, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="1,2,3")
    ap.add_argument("--d_chunk", type=int, default=16)
    ap.add_argument("--row_band", type=int, default=12)
    ap.add_argument("--col_band", type=int, default=128)
    ap.add_argument("--tile_w", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--height", type=int, default=2752)
    ap.add_argument("--width", type=int, default=1856)
    ap.add_argument("--f32", action="store_true", help="f32 bands (no bf16)")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--corr", action="store_true", help="also time corr_sweep_volume")
    args = ap.parse_args()

    from adamvs_tpu.ops.sweep_fuse import (
        corr_sweep_volume,
        fused_sweep_volume,
        merge_sources,
    )
    from adamvs_tpu.ops.warp import plane_sweep_warp

    rng = np.random.RandomState(0)
    mm = None if args.f32 else jnp.bfloat16
    for si in [int(x) for x in args.stages.split(",")]:
        (h, w, C, D, ref_feat, src_feats, src_projs, ref_proj,
         weights, lo, step) = stage_case(si, args.height, args.width, 5, rng)
        srcs = merge_sources(src_feats, row_band=args.row_band,
                             col_band=args.col_band, mm_dtype=mm)
        RB, cb = srcs.rb, srcs.cb
        Vs = src_feats.shape[0]

        def run():
            out = fused_sweep_volume(
                ref_feat, srcs, src_projs, ref_proj, weights, lo, step,
                num_depth=D, d_chunk=args.d_chunk, tile_w=args.tile_w,
            )
            return float(jnp.sum(out))

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        P = 8 * args.tile_w
        tiles = -(-h // 8) * -(-w // args.tile_w)
        L = RB * C
        flops = tiles * Vs * D * 2 * P * (cb * L + L * C)
        band_gb = tiles * Vs * (-(-D // args.d_chunk)) * cb * L * (
            2 if mm else 4) / 1e9
        print(f"stage{si} {h}x{w} C={C} D={D} RB={RB} cb={cb}: "
              f"compile {compile_s:.1f}s, run {t*1e3:.1f} ms, "
              f"{flops/t/1e12:.1f} TF/s, bands {band_gb:.2f} GB "
              f"({band_gb/t:.0f} GB/s)")

        if args.corr and si == 1:
            def runc():
                out = corr_sweep_volume(
                    ref_feat, srcs, src_projs, ref_proj, lo, step,
                    num_depth=D, d_chunk=args.d_chunk, tile_w=args.tile_w,
                )
                return float(jnp.sum(out))
            t0 = time.perf_counter()
            runc()
            c_s = time.perf_counter() - t0
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                runc()
                ts.append(time.perf_counter() - t0)
            print(f"  corr: compile {c_s:.1f}s, run {np.median(ts)*1e3:.1f} ms")

        if args.parity:
            # parity on a cropped window (full gather warp at full res is slow)
            hw, ww = min(h, 256), min(w, 256)
            rs = ref_feat[:, :hw, :ww]
            ss = src_feats[:, :, :hw, :ww]
            srcs_w = merge_sources(ss, row_band=args.row_band,
                                   col_band=args.col_band, mm_dtype=mm)
            low, stw = lo[:, :hw, :ww], step[:, :hw, :ww]
            wts = weights[:, :hw, :ww]
            got = fused_sweep_volume(
                rs, srcs_w, src_projs, ref_proj, wts, low, stw,
                num_depth=D, d_chunk=args.d_chunk, tile_w=args.tile_w,
            )
            wn = wts / (1e-5 + jnp.sum(wts, axis=-1, keepdims=True))
            want = 0.0
            for v in range(Vs):
                dmaps = low[:, None] + jnp.arange(D, dtype=jnp.float32)[
                    None, :, None, None] * stw[:, None]
                warped = plane_sweep_warp(ss[v], src_projs[v], ref_proj, dmaps)
                want = want + jnp.moveaxis(
                    wn[..., v:v+1][:, None] * (rs[:, None] * warped), 1, 0)
            err = jnp.abs(got - want)
            den = float(jnp.std(want)) + 1e-9
            print(f"  parity({hw}x{ww}): rel_max {float(jnp.max(err))/den:.2e} "
                  f"rel_mean {float(jnp.mean(err))/den:.2e}")


if __name__ == "__main__":
    main()
