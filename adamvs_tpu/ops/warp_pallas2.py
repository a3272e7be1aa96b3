"""Merged-lane Pallas TPU kernel for block-banded bilinear sampling (v2).

Same band/tile semantics as ``ops.warp_banded`` / ``ops.warp_pallas``, but the
source image is pre-transposed to ``[B, W, H*C]`` (lane = h*C + c) so that:

- the per-tile band DMA yields one contiguous ``[cb, RB*C]`` VMEM block
  (sublane = x, lane = (row, channel) merged);
- the horizontal hat contraction is ONE fat MXU matmul
  ``[P, cb] x [cb, RB*C]`` — N = RB*C (256+) instead of the per-channel
  ``N = rb`` (~40) thin matmuls of v1, so MXU utilization is ~6x better and
  the per-pixel FLOP count drops ~3x (cb=128 vs 320);
- the vertical hat combine is pure VPU work: the row-hat weights are built
  directly in expanded ``[P, RB*C]`` form from an iota (row = lane // C), and
  the per-row-group lane reduction is a log2(RB) tree of circular
  ``pltpu.roll``s (roll stride = C * 2^k wraps lanes across row groups; after
  the tree, lanes [0, C) hold exact group sums because RB*C is the roll
  period and the stride-C orbit covers every group exactly once).

Alignment scheme (all static):
- lane offset of a band row = v0 * C must be a 128-lane multiple, so v0 is
  aligned down to ``Lv = 128 // C`` rows (requires C | 128); RB = pow2 >=
  row_band + Lv so the roll tree terminates at lanes [0, C);
- sublane offset u0 aligned down to 8; cb rounded up to 128 (the MXU K-dim
  floor — narrower bands win nothing).

Zeros-padding semantics are inherited from the hat weights exactly as in the
XLA banded variant (ops/warp_banded.py): out-of-image or out-of-band samples
get zero weight mass. Reference math being reproduced: homo_warping_float
(models/module.py:527-568).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _source_coords, warp_transform
from .warp_banded import banded_bilinear_sample


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class MergedSource:
    """A source feature map pre-transformed to the kernel's merged-lane
    layout ``[B, Wp, Hp*C]``. The transform (pad + transpose + reshape +
    optional bf16 cast) is loop-invariant across depth hypotheses, but when
    done inside the sweep scan XLA re-executes it every slice (~21% of
    forward device time at bench shapes); pre-merging once per stage hoists
    it. Construct via ``merge_source``."""

    def __init__(self, data, h: int, w: int, c: int, out_dtype=jnp.float32):
        self.data = data  # [B, Wp, Hp*C]
        self.h = h
        self.w = w
        self.c = c
        self.out_dtype = out_dtype  # dtype of the original (pre-cast) source

    def tree_flatten(self):
        return (self.data,), (self.h, self.w, self.c, self.out_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


jax.tree_util.register_pytree_node(
    MergedSource, MergedSource.tree_flatten, MergedSource.tree_unflatten
)


def merge_source(feat: jnp.ndarray, row_band: int = 16, col_band: int = 112,
                 mm_dtype=None) -> MergedSource:
    """Pad + merge a [B,H,W,C] source to the kernel layout once (see
    ``MergedSource``). ``row_band``/``col_band`` must be >= the values later
    passed to the sampler (padding covers any aligned band)."""
    B, H, W, C = feat.shape
    out_dtype = feat.dtype
    if mm_dtype is not None and feat.dtype != mm_dtype:
        feat = feat.astype(mm_dtype)
    if 128 % C != 0:
        return MergedSource(feat, H, W, C, out_dtype)  # fallback keeps NHWC
    Lv = 128 // C
    RB = min(_next_pow2(row_band + Lv), _next_pow2(H))
    cb = -(-(col_band + 8) // 128) * 128
    Hp = max(-(-H // Lv) * Lv, RB)
    Wp = max(-(-W // 8) * 8, cb)
    if Hp != H or Wp != W:
        feat = jnp.pad(feat, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    feat_m = jnp.transpose(feat, (0, 2, 1, 3)).reshape(B, Wp, Hp * C)
    return MergedSource(feat_m, H, W, C, out_dtype)


def _sample_kernel2(
    vrow_ref,  # scalar-prefetch [T] band row origin (Lv-aligned)
    umin_ref,  # scalar-prefetch [T] band col origin (8-aligned)
    img_ref,  # scalar-prefetch [T] image index per tile
    uu_ref,  # [1, KT, P] VMEM (host-folded coords; small, cheap to fold)
    vv_ref,  # [1, KT, P] VMEM
    feat_ref,  # [B, Wp, Hp*C] merged-lane source, HBM
    out_ref,  # [1, KT*P, C] VMEM
    band_ref,  # scratch [2, KT, cb, RB*C] double-buffered
    sem,  # DMA sems [2, KT]
    *,
    cb: int,
    RB: int,
    C: int,
    KT: int,
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
        lu = uu_ref[0, k, :] - um.astype(jnp.float32)  # [P]
        lv = vv_ref[0, k, :] - vrow_ref[i].astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu[:, None] - x_idx))  # [P, cb]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(lv[:, None] - r_ids))  # [P, L]

        dma(g, k, slot).wait()
        band = band_ref[slot, k]  # [cb, L]
        hor = jax.lax.dot_general(
            wx.astype(band.dtype), band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, L]
        s = hor * wy
        step = C
        while step < L:
            # want s'[l] = s[l] + s[(l + step) mod L]; pltpu.roll needs a
            # non-negative shift, so rotate by L - step
            s = s + pltpu.roll(s, L - step, axis=1)
            step *= 2
        out_ref[0, k * P : (k + 1) * P, :] = s[:, :C].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "row_band", "col_band", "kt", "interpret",
                     "mm_dtype"),
)
def banded_bilinear_sample_pallas2(
    feat: jnp.ndarray,  # [B,H,W,C]
    u: jnp.ndarray,  # [B,N,h,w]
    v: jnp.ndarray,  # [B,N,h,w]
    tile_h: int = 8,
    tile_w: int = 64,
    row_band: int = 16,
    col_band: int = 112,
    kt: int = 4,
    interpret: bool = False,
    mm_dtype=None,
) -> jnp.ndarray:
    """``mm_dtype=jnp.bfloat16`` runs the band DMA + hat matmul in bf16
    (halved HBM traffic) with f32 accumulation and f32 output; only the
    sampled feature values and hat weights are quantized — sample coordinates
    stay f32. (The nominal-f32 matmul already feeds the MXU bf16 inputs under
    JAX's default dot precision, so results are identical; the win is DMA.)

    ``feat`` may be a ``MergedSource`` (pre-transformed once per stage — see
    ``merge_source``) or a raw [B,H,W,C] array merged here per call."""
    if isinstance(feat, MergedSource):
        out_dtype = feat.out_dtype
        H, W, C = feat.h, feat.w, feat.c
        if 128 % C != 0:
            return banded_bilinear_sample(
                feat.data, u, v, tile_h=tile_h, tile_w=max(tile_w, 128),
                row_band=max(row_band, 32), col_band=max(col_band, 256),
            ).astype(out_dtype)
        feat_m = feat.data
        B, Wp = feat_m.shape[0], feat_m.shape[1]
        Hp = feat_m.shape[2] // C
        Lv = 128 // C
        RB = min(_next_pow2(row_band + Lv), _next_pow2(H))
        cb = -(-(col_band + 8) // 128) * 128
        if Hp < RB or Wp < cb:
            raise ValueError(
                f"MergedSource padded to ({Hp},{Wp}) but bands need >= ({RB},{cb});"
                " merge_source must be called with bands >= the sampler's"
            )
        N = u.shape[1]
        h, w = u.shape[2], u.shape[3]
    else:
        out_dtype = feat.dtype
        if mm_dtype is not None and feat.dtype != mm_dtype:
            feat = feat.astype(mm_dtype)
        B, H, W, C = feat.shape
        if 128 % C != 0:
            # merged-lane alignment needs C | 128; rare in practice (features
            # are 8/16/32ch) — fall back to the XLA banded path
            return banded_bilinear_sample(
                feat, u, v, tile_h=tile_h, tile_w=max(tile_w, 128),
                row_band=max(row_band, 32), col_band=max(col_band, 256),
            ).astype(out_dtype)
        N = u.shape[1]
        h, w = u.shape[2], u.shape[3]
        Lv = 128 // C
        RB = min(_next_pow2(row_band + Lv), _next_pow2(H))
        cb = -(-(col_band + 8) // 128) * 128

        # pad source so any aligned band fits: H to Lv multiples (lane
        # alignment), W to 8 (sublane alignment), both to at least the band
        # size. Padded texels are zero == zeros-padding past the true border.
        Hp = max(-(-H // Lv) * Lv, RB)
        Wp = max(-(-W // 8) * 8, cb)
        if Hp != H or Wp != W:
            feat = jnp.pad(feat, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        feat_m = jnp.transpose(feat, (0, 2, 1, 3)).reshape(B, Wp, Hp * C)

    # image-layout tiling: pad (h, w) so rows split into tile_h bands and
    # cols into groups of KT tiles — every host-side fold/unfold below is a
    # pure RESHAPE (splitting/merging adjacent dims), never a transpose. The
    # old [T, P] flat-tile layout transposed u, v, AND the output through HBM
    # every call (~0.8 s/forward at bench shapes, tools/trace_attrib.py).
    KT = max(1, kt)
    ph = (-h) % tile_h
    pw = (-w) % (KT * tile_w)
    if ph or pw:
        # out-of-image coords sample to zero; padded rows/cols cropped below
        u = jnp.pad(u, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1e9)
    hp, wp = h + ph, w + pw
    nty, ntx = hp // tile_h, wp // tile_w
    P = tile_h * tile_w
    gx = ntx // KT
    G = B * N * nty * gx  # grid steps; step g covers KT x-adjacent tiles
    T = G * KT

    big = 1e9
    u5 = u.reshape(B * N, nty, tile_h, ntx, tile_w)
    v5 = v.reshape(B * N, nty, tile_h, ntx, tile_w)

    def fold(x5):  # coords are small; this transpose is cheap
        return x5.transpose(0, 1, 3, 2, 4).reshape(G, KT, P)

    uu = fold(u5)
    vv = fold(v5)
    safe_u = jnp.where(jnp.abs(u5) < big, u5, big)
    safe_v = jnp.where(jnp.abs(v5) < big, v5, big)
    # per-tile minima: reduce over (tile_h, tile_w); flat order == tile id
    umin = jnp.clip(jnp.floor(jnp.min(safe_u, axis=(2, 4))), 0, Wp - cb)
    vmin = jnp.clip(jnp.floor(jnp.min(safe_v, axis=(2, 4))), 0, Hp - RB)
    umin = ((umin.astype(jnp.int32) // 8) * 8).reshape(T)
    vrow = ((vmin.astype(jnp.int32) // Lv) * Lv).reshape(T)
    img_idx = (jnp.arange(T, dtype=jnp.int32) // (nty * ntx)) // N

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
    flops_per_tile = 2 * P * cb * RB * C
    out = pl.pallas_call(
        functools.partial(_sample_kernel2, cb=cb, RB=RB, C=C, KT=KT),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, KT * P, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=G * KT * flops_per_tile,
            bytes_accessed=G * KT * (cb * RB * C + P * C) * feat_m.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vrow, umin, img_idx, uu, vv, feat_m)

    out = out.reshape(B, N, nty, ntx, tile_h, tile_w, C)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, N, hp, wp, C)
    return out[:, :, :h, :w]


def plane_sweep_warp_pallas2(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth: jnp.ndarray,
    grid_hw: tuple[int, int] | None = None,
    tile_h: int = 8,
    tile_w: int = 64,
    row_band: int = 16,
    col_band: int = 112,
    kt: int = 4,
    interpret: bool = False,
    mm_dtype=None,
) -> jnp.ndarray:
    """Drop-in merged-lane variant of ``ops.warp.plane_sweep_warp``.
    ``src_feat`` may be a pre-transformed ``MergedSource``."""
    if depth.ndim == 4:
        H, W = depth.shape[2:4]
    elif grid_hw is not None:
        H, W = grid_hw
    elif isinstance(src_feat, MergedSource):
        H, W = src_feat.h, src_feat.w
    else:
        H, W = src_feat.shape[1:3]
    rot, trans = warp_transform(src_proj, ref_proj)
    u, v = _source_coords(rot, trans, depth, H, W)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return banded_bilinear_sample_pallas2(
        src_feat, u, v, tile_h=tile_h, tile_w=tile_w,
        row_band=row_band, col_band=col_band, kt=kt, interpret=interpret,
        mm_dtype=mm_dtype,
    )
