"""Block-banded bilinear sampling — the TPU-fast plane-sweep warp.

XLA lowers per-element gathers (the torch ``grid_sample`` shape of the
problem) to scalar-ish loops on TPU: measured ~2% of HBM bandwidth, ~78% of
the whole model's runtime (see bench ablations). This module reformulates the
warp so the sampling runs on the MXU instead:

- The output is processed in tiles (default 8x128 pixels). Plane-sweep sample
  coordinates are smooth and near-affine within a tile, so each tile's
  source samples live in a small band of the source image.
- Per tile, the band's row/col origin is computed at runtime (exact, from the
  tile's min coordinate); the band is fetched with ``dynamic_slice`` — a
  coarse, coalesced load instead of per-pixel gathers.
- Bilinear sampling inside the band becomes two small dense contractions with
  hat-function one-hot weights built from ``iota`` comparisons:
  ``vert[p,x,c] = Σ_r relu(1-|lv_p - r|)·band[r,x,c]`` (MXU matmul), then
  ``out[p,c] = Σ_x relu(1-|lu_p - x|)·vert[p,x,c]``.

Semantics: identical to ``ops.warp.bilinear_sample`` (zeros padding,
``align_corners=True`` pixel coords) whenever each tile's samples fit the
static band — clipping the band inside the image makes torch's zeros-padding
fall out of the hat weights naturally. Samples farther than the band from the
tile's minimum (possible only across extreme depth discontinuities within one
tile) contribute zero, like out-of-image samples; band sizes are config knobs
sized so this does not occur for the supported camera geometries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .warp import _source_coords, warp_transform


MEM_BUDGET_BYTES = 256 * 1024 * 1024  # cap on the live per-chunk hat intermediate


def banded_bilinear_sample(
    feat: jnp.ndarray,  # [B,H,W,C]
    u: jnp.ndarray,  # [B,N,h,w]
    v: jnp.ndarray,  # [B,N,h,w]
    tile_h: int = 8,
    tile_w: int = 128,
    row_band: int = 32,
    col_band: int = 256,
) -> jnp.ndarray:
    """Sample feat at (u, v); returns [B,N,h,w,C].

    Memory is bounded: the [P, rb, C] hat-contraction intermediate exists for
    at most one ``lax.map`` chunk of tiles at a time (chunk sized so the live
    intermediate stays under ``MEM_BUDGET_BYTES``), so full-aerial-resolution
    sweeps compile in fixed HBM instead of materializing every tile at once.
    """
    B, H, W, C = feat.shape
    N = u.shape[1]
    h, w = u.shape[2], u.shape[3]
    rb = min(row_band, H)
    cb = min(col_band, W)

    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        # out-of-image coords sample to zero and are cropped afterwards
        u = jnp.pad(u, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
    hp, wp = h + ph, w + pw
    nty, ntx = hp // tile_h, wp // tile_w
    P = tile_h * tile_w

    def fold(x):  # [B,N,hp,wp] -> [B*N*nty*ntx, P]
        x = x.reshape(B * N, nty, tile_h, ntx, tile_w)
        return x.transpose(0, 1, 3, 2, 4).reshape(-1, P)

    uu = fold(u)
    vv = fold(v)
    # exact per-tile band origin; clip keeps the band inside the image so the
    # hat weights reproduce zeros-padding at the borders
    big = 1e9
    safe_u = jnp.where(jnp.abs(uu) < big, uu, big)
    safe_v = jnp.where(jnp.abs(vv) < big, vv, big)
    umin = jnp.clip(jnp.floor(jnp.min(safe_u, axis=-1)), 0, W - cb).astype(jnp.int32)
    vmin = jnp.clip(jnp.floor(jnp.min(safe_v, axis=-1)), 0, H - rb).astype(jnp.int32)

    r_idx = jnp.arange(rb, dtype=jnp.float32)
    c_idx = jnp.arange(cb, dtype=jnp.float32)

    def one_tile(fb, uu_t, vv_t, um, vm):
        band = jax.lax.dynamic_slice(fb, (vm, um, 0), (rb, cb, C))
        lv = vv_t - vm
        lu = uu_t - um
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(lv[:, None] - r_idx[None, :]))  # [P,rb]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu[:, None] - c_idx[None, :]))  # [P,cb]
        # horizontal-first: the intermediate is [P, rb, C] (rb << cb), the cb
        # contraction runs on the MXU, the rb combine on the VPU
        hor = jnp.einsum(
            "px,rxc->prc", wx, band, preferred_element_type=jnp.float32
        )
        return jnp.einsum("pr,prc->pc", wy, hor, preferred_element_type=jnp.float32)

    tiles_per_im = nty * ntx
    feat_b = jnp.repeat(feat, N, axis=0) if N > 1 else feat  # [B*N,H,W,C]
    BN = B * N
    uu = uu.reshape(BN, tiles_per_im, P)
    vv = vv.reshape(BN, tiles_per_im, P)
    umin = umin.reshape(BN, tiles_per_im)
    vmin = vmin.reshape(BN, tiles_per_im)

    per_tile_bytes = P * rb * C * 4
    chunk = max(1, MEM_BUDGET_BYTES // max(1, BN * per_tile_bytes))
    inner = jax.vmap(  # over B*N x chunk tiles
        jax.vmap(one_tile, in_axes=(None, 0, 0, 0, 0))
    )

    if chunk >= tiles_per_im:
        out = inner(feat_b, uu, vv, umin, vmin)  # [BN, nt, P, C]
    else:
        nc = -(-tiles_per_im // chunk)
        pad_t = nc * chunk - tiles_per_im
        if pad_t:
            # dummy tiles: far-out coords sample to zero; cropped below
            uu = jnp.pad(uu, ((0, 0), (0, pad_t), (0, 0)), constant_values=-big)
            vv = jnp.pad(vv, ((0, 0), (0, pad_t), (0, 0)), constant_values=-big)
            umin = jnp.pad(umin, ((0, 0), (0, pad_t)))
            vmin = jnp.pad(vmin, ((0, 0), (0, pad_t)))

        def to_chunks(x):  # [BN, nc*chunk, ...] -> [nc, BN, chunk, ...]
            return jnp.moveaxis(x.reshape((BN, nc, chunk) + x.shape[2:]), 1, 0)

        out = jax.lax.map(
            lambda a: inner(feat_b, *a),
            (to_chunks(uu), to_chunks(vv), to_chunks(umin), to_chunks(vmin)),
        )  # [nc, BN, chunk, P, C]
        out = jnp.moveaxis(out, 0, 1).reshape(BN, nc * chunk, P, C)
        out = out[:, :tiles_per_im]

    out = out.reshape(B, N, nty, ntx, tile_h, tile_w, C)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, N, hp, wp, C)
    return out[:, :, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "row_band", "col_band"),
)
def band_overflow(
    u: jnp.ndarray,  # [B,N,h,w] source-pixel coords (as fed to the sampler)
    v: jnp.ndarray,
    height: int,
    width: int,
    tile_h: int = 8,
    tile_w: int = 128,
    row_band: int = 32,
    col_band: int = 256,
) -> dict[str, jnp.ndarray]:
    """Detect the banded sampler's silent failure mode: in-image samples
    farther than the static band from their tile's minimum coordinate get
    ZERO contribution (indistinguishable from out-of-image samples). Returns
    per-call diagnostics — ``overflow_frac`` is the fraction of in-image
    samples that the banded/pallas kernels would silently zero, and
    ``max_vspread``/``max_uspread`` are the worst per-tile coordinate spreads
    (must be <= row_band-1 / col_band-1 for exactness). Use in debug paths,
    tests, and the bench self-test; the hot kernels do not pay for it."""
    B, N, h, w = u.shape
    rb = min(row_band, height)
    cb = min(col_band, width)
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
    hp, wp = h + ph, w + pw
    P = tile_h * tile_w

    def fold(x):
        x = x.reshape(B * N, hp // tile_h, tile_h, wp // tile_w, tile_w)
        return x.transpose(0, 1, 3, 2, 4).reshape(-1, P)

    uu, vv = fold(u), fold(v)
    big = 1e9
    in_img = (uu > -1) & (uu < width) & (vv > -1) & (vv < height)
    safe_u = jnp.where(jnp.abs(uu) < big, uu, big)
    safe_v = jnp.where(jnp.abs(vv) < big, vv, big)
    umin = jnp.clip(jnp.floor(jnp.min(safe_u, axis=-1, keepdims=True)), 0, width - cb)
    vmin = jnp.clip(jnp.floor(jnp.min(safe_v, axis=-1, keepdims=True)), 0, height - rb)
    # a sample contributes iff its hat weights overlap the band: lv in (-1, rb)
    lost = in_img & ((vv - vmin >= rb) | (uu - umin >= cb))
    vspread = jnp.where(in_img, vv - vmin, 0.0)
    uspread = jnp.where(in_img, uu - umin, 0.0)
    denom = jnp.maximum(jnp.sum(in_img), 1)
    return {
        "overflow_frac": jnp.sum(lost) / denom,
        "max_vspread": jnp.max(vspread),
        "max_uspread": jnp.max(uspread),
    }


def plane_sweep_band_overflow(
    src_feat_hw: tuple[int, int],
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth: jnp.ndarray,
    grid_hw: tuple[int, int] | None = None,
    **band_kw,
) -> dict[str, jnp.ndarray]:
    """``band_overflow`` on the coordinates a plane-sweep warp would sample."""
    if depth.ndim == 4:
        H, W = depth.shape[2:4]
    elif grid_hw is not None:
        H, W = grid_hw
    else:
        H, W = src_feat_hw
    rot, trans = warp_transform(src_proj, ref_proj)
    u, v = _source_coords(rot, trans, depth, H, W)
    return band_overflow(u, v, src_feat_hw[0], src_feat_hw[1], **band_kw)


@functools.partial(
    jax.jit, static_argnames=("grid_hw", "tile_h", "tile_w", "row_band", "col_band")
)
def plane_sweep_warp_banded(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth: jnp.ndarray,
    grid_hw: tuple[int, int] | None = None,
    tile_h: int = 8,
    tile_w: int = 128,
    row_band: int = 32,
    col_band: int = 256,
) -> jnp.ndarray:
    """Drop-in banded variant of ``ops.warp.plane_sweep_warp``."""
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
    return banded_bilinear_sample(
        src_feat, u, v, tile_h=tile_h, tile_w=tile_w, row_band=row_band, col_band=col_band
    )
