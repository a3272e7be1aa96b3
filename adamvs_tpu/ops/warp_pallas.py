"""Pallas TPU kernel for block-banded bilinear sampling.

Same algorithm as ``ops.warp_banded`` (see that module for the band/tile
semantics) but hand-scheduled: one grid step per output tile, the source band
DMA'd HBM->VMEM with scalar-prefetched offsets, hat-function one-hot weights
built on the VPU, and the horizontal contraction run on the MXU:

    hor[p, (r,c)] = Σ_x  relu(1-|lu_p - x|) · band[r, x, c]      (MXU)
    out[p, c]     = Σ_r  relu(1-|lv_p - r|) · hor[p, r, c]       (VPU)

The horizontal-first order keeps the intermediate at [P, rb·C] (VMEM-sized)
instead of [P, cb·C].

Layout notes:
- the band is DMA'd as [rb, cb·C] rows and transposed in VMEM to [cb, rb·C]
  so the MXU contraction runs over the x axis;
- tiles are P = tile_h·tile_w output pixels, flattened; offsets (vmin, umin)
  per tile are scalar-prefetched so the DMA can start before the body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _source_coords, warp_transform


def _sample_kernel(
    vmin_ref,  # scalar-prefetch [T]
    umin_ref,  # scalar-prefetch [T]
    img_ref,  # scalar-prefetch [T] image index per tile
    uu_ref,  # [1, 1, P] VMEM
    vv_ref,  # [1, 1, P] VMEM
    feat_ref,  # [B, C, H, W] channel-first, ANY/HBM
    out_ref,  # [1, P, C] VMEM
    band_ref,  # scratch [C, rb, cb]
    sem,
    *,
    rb: int,
    cb: int,
):
    t = pl.program_id(0)
    # offsets are pre-aligned on the host: Mosaic requires provable 8-row /
    # 128-lane divisibility for dynamic DMA slicing
    vm = pl.multiple_of(vmin_ref[t], 8)
    um = pl.multiple_of(umin_ref[t], 128)
    img = img_ref[t]

    copy = pltpu.make_async_copy(
        feat_ref.at[img, :, pl.ds(vm, rb), pl.ds(um, cb)], band_ref, sem
    )
    copy.start()

    P = uu_ref.shape[2]
    C = out_ref.shape[2]
    lu = uu_ref[0, 0, :] - um.astype(jnp.float32)  # [P]
    lv = vv_ref[0, 0, :] - vm.astype(jnp.float32)

    # Mosaic iota is integer-only
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (P, cb), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu[:, None] - x_idx))  # [P, cb]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (P, rb), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(lv[:, None] - r_idx))  # [P, rb]

    copy.wait()
    # per-channel: horizontal contraction on the MXU (rhs contracted on its x
    # axis — no transpose or reshape, which Mosaic's layout pass can't merge),
    # then the rb-sized vertical combine on the VPU
    outs = []
    for c in range(C):
        band_c = band_ref[c]  # [rb, cb]
        hor_c = jax.lax.dot_general(
            wx, band_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, rb]
        outs.append(jnp.sum(wy * hor_c, axis=1, keepdims=True))  # [P, 1]
    out_ref[0, :, :] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "row_band", "col_band", "interpret"),
)
def banded_bilinear_sample_pallas(
    feat: jnp.ndarray,  # [B,H,W,C]
    u: jnp.ndarray,  # [B,N,h,w]
    v: jnp.ndarray,  # [B,N,h,w]
    tile_h: int = 8,
    tile_w: int = 64,
    row_band: int = 32,
    col_band: int = 192,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, C = feat.shape
    N = u.shape[1]
    h, w = u.shape[2], u.shape[3]
    # zero-pad the source to DMA-aligned dims: padded texels contribute zero,
    # exactly the zeros-padding semantics for samples past the true border
    fh = (-H) % 8
    fw = (-W) % 128
    if fh or fw:
        feat = jnp.pad(feat, ((0, 0), (0, fh), (0, fw), (0, 0)))
        H, W = H + fh, W + fw
    # band sizes padded by the DMA alignment slack (offsets rounded down to
    # 8-row / 128-lane boundaries), then themselves aligned
    rb = min(-(-(row_band + 8) // 8) * 8, H)
    cb = min(-(-(col_band + 128) // 128) * 128, W)

    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
    hp, wp = h + ph, w + pw
    nty, ntx = hp // tile_h, wp // tile_w
    P = tile_h * tile_w
    tiles_per_im = nty * ntx
    T = B * N * tiles_per_im

    def fold(x):
        x = x.reshape(B * N, nty, tile_h, ntx, tile_w)
        return x.transpose(0, 1, 3, 2, 4).reshape(T, P)

    uu = fold(u)
    vv = fold(v)
    big = 1e9
    safe_u = jnp.where(jnp.abs(uu) < big, uu, big)
    safe_v = jnp.where(jnp.abs(vv) < big, vv, big)
    umin = jnp.clip(jnp.floor(jnp.min(safe_u, axis=-1)), 0, W - cb).astype(jnp.int32)
    vmin = jnp.clip(jnp.floor(jnp.min(safe_v, axis=-1)), 0, H - rb).astype(jnp.int32)
    umin = (umin // 128) * 128
    vmin = (vmin // 8) * 8
    img_idx = (jnp.arange(T, dtype=jnp.int32) // tiles_per_im) // N

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            # [T,1,P] with (1,1,P) blocks satisfies Mosaic's (8,128) tiling
            # rule (trailing dims equal to the array's)
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            # source stays in HBM; bands are DMA'd per tile (pl.ANY let the
            # compiler pull the whole image into VMEM, which cannot scale)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((C, rb, cb), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    feat_cf = jnp.transpose(feat, (0, 3, 1, 2))  # channel-first for clean 2D band slices
    out = pl.pallas_call(
        functools.partial(_sample_kernel, rb=rb, cb=cb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P, C), feat.dtype),
        interpret=interpret,
    )(vmin, umin, img_idx, uu[:, None, :], vv[:, None, :], feat_cf)

    out = out.reshape(B, N, nty, ntx, tile_h, tile_w, C)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, N, hp, wp, C)
    return out[:, :, :h, :w]


def plane_sweep_warp_pallas(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth: jnp.ndarray,
    grid_hw: tuple[int, int] | None = None,
    tile_h: int = 8,
    tile_w: int = 64,
    row_band: int = 32,
    col_band: int = 192,
    interpret: bool = False,
) -> jnp.ndarray:
    if depth.ndim == 4:
        H, W = depth.shape[2:4]
    elif grid_hw is not None:
        H, W = grid_hw
    else:
        H, W = src_feat.shape[1:3]
    rot, trans = warp_transform(src_proj, ref_proj)
    u, v = _source_coords(rot, trans, depth, H, W)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return banded_bilinear_sample_pallas(
        src_feat, u, v, tile_h=tile_h, tile_w=tile_w,
        row_band=row_band, col_band=col_band, interpret=interpret,
    )
