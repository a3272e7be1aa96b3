"""Fused plane-sweep kernels: the whole cost volume in one Pallas call.

The streamed sweep (models/adamvs.py `_AdaFuseStreamCell`) re-warps every
source view at every depth step, so each (tile, view) source band is DMA'd D
times per stage and every step pays fold/unfold layout formatting. On-device
attribution (tools/kernel_probe.py, tools/trace_attrib.py) shows the warp
kernels are DMA-BOUND (the strided band fetch alone costs as much as all
compute) and the VPU roll-tree vertical combine is the second cost.

These kernels fix both:

- ONE band DMA per (tile, view) serves ALL depth hypotheses of that tile
  (coordinates are Möbius-monotone in depth, so the per-chunk band is bounded
  by its endpoint coordinates — computed on host, scalar-prefetched);
- sample coordinates are computed IN-KERNEL from the camera geometry and the
  per-pixel hypothesis plan ``hyp = lo + i*step`` (nothing per-depth crosses
  HBM on the input side);
- the vertical (row-group) combine is an MXU matmul against a constant
  group-summation matrix ``S[(r,c'),c] = [c'==c]`` instead of a log2(RB)
  VPU roll tree;
- the visibility-weighted multi-view fusion ``Σ_v w'_v (ref ⊙ warp_v)``
  accumulates in VMEM across the view loop, so per-view warp volumes never
  exist in HBM.

Two entry points sharing one kernel skeleton:

- ``fused_sweep_volume``: the adaptive-visibility fused volume
  [D, B, h, w, C] (reference semantics: adamvs.py:497-512 with normalized
  weights ``w'_v = w_v / (1e-5 + Σw)`` folded in on host);
- ``corr_sweep_volume``: per-view channel-mean correlation volumes
  [Vs, B, h, w, D] for the stage-1 visibility estimator (adamvs.py:268-288).

Zeros-padding bilinear semantics are inherited from the hat weights exactly
as in ops/warp_banded.py; behind-camera samples are driven out of band like
ops/warp.py::_source_coords. Reference math: homo_warping_float
(models/module.py:527-568).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _source_coords, warp_transform


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class MergedSources:
    """All source views' stage features in the merged-lane band layout
    ``[Vs, B, Wp, Hp*C]`` (lane = h*C + c, sublane = x), padded so any
    (RB, cb)-aligned band stays in range. One transform per stage serves
    every (view, depth, tile) band DMA."""

    def __init__(self, data, h, w, c, rb, cb, out_dtype):
        self.data = data
        self.h = h
        self.w = w
        self.c = c
        self.rb = rb  # band rows (lane groups) — pow2, >= Lv
        self.cb = cb  # band cols (sublanes) — multiple of 128
        self.out_dtype = out_dtype

    def tree_flatten(self):
        return (self.data,), (self.h, self.w, self.c, self.rb, self.cb, self.out_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


jax.tree_util.register_pytree_node(
    MergedSources, MergedSources.tree_flatten, MergedSources.tree_unflatten
)


def merge_sources(
    feats: jnp.ndarray,  # [Vs, B, H, W, C]
    row_band: int = 12,
    col_band: int = 128,
    mm_dtype=jnp.bfloat16,
) -> MergedSources:
    """Pad + transpose all source views to the band layout once. ``row_band``
    is the usable row-span budget (alignment slack is added internally);
    ``col_band`` rounds up to a 128 multiple. Requires C | 128."""
    Vs, B, H, W, C = feats.shape
    if 128 % C != 0:
        raise ValueError(f"merged-lane layout needs C | 128, got C={C}")
    out_dtype = feats.dtype
    if mm_dtype is not None and feats.dtype != mm_dtype:
        feats = feats.astype(mm_dtype)
    Lv = 128 // C
    RB = min(_next_pow2(row_band + Lv), _next_pow2(H))
    cb = -(-col_band // 128) * 128
    Hp = max(-(-H // Lv) * Lv, RB)
    Wp = max(-(-W // 8) * 8, cb)
    if Hp != H or Wp != W:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    data = jnp.transpose(feats, (0, 1, 3, 2, 4)).reshape(Vs, B, Wp, Hp * C)
    return MergedSources(data, H, W, C, RB, cb, out_dtype)


def _band_origins(
    rot, trans,  # [Vs,B,3,3], [Vs,B,3]
    lo, step,  # [B,h,w]
    D: int, Dc: int,
    tile_h: int, tile_w: int,
    Hp: int, Wp: int, RB: int, cb: int, Lv: int,
    hp: int, wp: int,
):
    """Per-(view, batch, chunk, tile) aligned band origins, packed for the
    kernel's DMA-sequence order. u/v are Möbius-monotone in the hypothesis
    value (z is affine in hyp and positive wherever valid), so each chunk's
    coordinate range is bounded by its two endpoint hypothesis maps."""
    Vs, B = rot.shape[:2]
    h, w = lo.shape[1:]
    NC = D // Dc
    # endpoint hypothesis maps per chunk: [B, 2*NC, h, w]
    idx = []
    for c in range(NC):
        idx += [c * Dc, (c + 1) * Dc - 1]
    i = jnp.asarray(idx, jnp.float32)[None, :, None, None]
    hyps = lo[:, None] + i * step[:, None]

    big = jnp.float32(1e9)
    umins, vrows = [], []
    for v in range(Vs):
        u, vv = _source_coords(rot[v], trans[v], hyps, h, w)  # [B,2NC,h,w]
        safe_u = jnp.where(jnp.abs(u) < big, u, big)
        safe_v = jnp.where(jnp.abs(vv) < big, vv, big)
        # pad to tile multiples with +big (ignored by the min)
        ph, pw = hp - h, wp - w
        safe_u = jnp.pad(safe_u, ((0, 0), (0, 0), (0, ph), (0, pw)),
                         constant_values=big)
        safe_v = jnp.pad(safe_v, ((0, 0), (0, 0), (0, ph), (0, pw)),
                         constant_values=big)
        nty, ntx = hp // tile_h, wp // tile_w

        def tmin(x):  # [B,2NC,hp,wp] -> [B,NC,T] min over (endpoints, tile px)
            x = x.reshape(B, NC, 2, nty, tile_h, ntx, tile_w)
            return x.min(axis=(2, 4, 6)).reshape(B, NC, nty * ntx)

        um = jnp.clip(jnp.floor(tmin(safe_u)), 0, Wp - cb).astype(jnp.int32)
        vm = jnp.clip(jnp.floor(tmin(safe_v)), 0, Hp - RB).astype(jnp.int32)
        umins.append((um // 8) * 8)
        vrows.append((vm // Lv) * Lv)
    # [Vs,B,NC,T] -> DMA order s = ((b*NC + c)*T + t)*Vs + v
    um = jnp.stack(umins).transpose(1, 2, 3, 0).reshape(-1)
    vr = jnp.stack(vrows).transpose(1, 2, 3, 0).reshape(-1)
    return um, vr


def _fold_tiles(x: jnp.ndarray, tile_h: int, tile_w: int, fill=0.0):
    """[B, h, w, (C?)] -> [B*T, P, (C)] in tile-major order (pads with fill)."""
    B, h, w = x.shape[:3]
    trail = x.shape[3:]
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        pad = ((0, 0), (0, ph), (0, pw)) + ((0, 0),) * len(trail)
        x = jnp.pad(x, pad, constant_values=fill)
    hp, wp = h + ph, w + pw
    nty, ntx = hp // tile_h, wp // tile_w
    x = x.reshape((B, nty, tile_h, ntx, tile_w) + trail)
    x = jnp.moveaxis(x, 3, 2)  # [B, nty, ntx, th, tw, ...]
    return x.reshape((B * nty * ntx, tile_h * tile_w) + trail)


def _fold_tiles_t(x: jnp.ndarray, tile_h: int, tile_w: int, fill=0.0):
    """[B, h, w, K] -> [B*T, K, P]: channels on sublanes, pixels on lanes.

    The whole kernel runs in this transposed orientation so every HBM
    array's trailing dim is P (a 128 multiple) — a [.., P, C] layout would be
    lane-padded C -> 128 by the (8,128) tiling, inflating HBM size and
    bandwidth up to 16x for C=8."""
    return jnp.swapaxes(_fold_tiles(x, tile_h, tile_w, fill), 1, 2)


def _sweep_kernel(
    # scalar prefetch, then VMEM inputs (mode-dependent), HBM feat, out, scratch
    umin_ref, vrow_ref, geom_ref,
    *refs,
    Vs: int, B: int, NC: int, T: int, ntx: int,
    Dc: int, C: int, RB: int, cb: int,
    tile_h: int, tile_w: int,
    mode: str,  # "fused" | "corr"
    mm_dtype,
):
    """Depth loop is a ``fori_loop`` with the per-hypothesis slice written
    through a dynamic leading out index — a python-unrolled Dc x Vs body keeps
    every iteration's [P,L] intermediates live and blows Mosaic's 16M scoped
    vmem stack at stage-1 widths (measured 21.9M at Dc=16, Vs=4, C=32)."""
    if mode == "fused":
        ls_ref, ref_ref, w_ref, feat_ref, out_ref, band_ref, sem = refs
        KV = Vs  # bands resident per grid step
    elif mode == "var":
        ls_ref, ref_ref, feat_ref, out_ref, band_ref, sem = refs
        w_ref = None
        KV = Vs
    else:  # corr
        ls_ref, ref_ref, feat_ref, out_ref, band_ref, sem = refs
        w_ref = None
        KV = 1
    g = pl.program_id(0)
    G = pl.num_programs(0)
    L = RB * C
    P = tile_h * tile_w

    # grid decode; in corr mode the leading grid axis is the view
    t = jax.lax.rem(g, T)
    r = jax.lax.div(g, T)
    c = jax.lax.rem(r, NC)
    r = jax.lax.div(r, NC)
    b = jax.lax.rem(r, B) if mode == "corr" else r
    tx = jax.lax.rem(t, ntx)
    ty = jax.lax.div(t, ntx)

    def dma(gs, v, slot):
        s = gs * KV + v
        um = pl.multiple_of(umin_ref[s], 8)
        vlane = pl.multiple_of(vrow_ref[s] * C, 128)
        if mode == "corr":
            v_s = jax.lax.div(gs, T * NC * B)
            b_s = jax.lax.rem(jax.lax.div(gs, T * NC), B)
        else:
            v_s = v
            b_s = jax.lax.div(gs, NC * T)
        return pltpu.make_async_copy(
            feat_ref.at[v_s, b_s, pl.ds(um, cb), pl.ds(vlane, L)],
            band_ref.at[slot, v],
            sem.at[slot, v],
        )

    buf = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        for v in range(KV):
            dma(g, v, buf).start()

    @pl.when(g + 1 < G)
    def _():
        for v in range(KV):
            dma(g + 1, v, nxt).start()

    # constant index fields (transposed orientation: pixels on LANES)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0).astype(jnp.float32)
    r_ids = (jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) // C).astype(jnp.float32)
    # group-summation matrix S[(r,c'),c] = [c'==c] — vertical combine as MXU
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0) % C
    col_c = jax.lax.broadcasted_iota(jnp.int32, (L, C), 1)
    S = (lane_c == col_c).astype(mm_dtype)

    # per-pixel reference coordinates of this tile, [1, P] rows
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (tx * tile_w + jax.lax.rem(pix, tile_w)).astype(jnp.float32)
    Y = (ty * tile_h + jax.lax.div(pix, tile_w)).astype(jnp.float32)
    ls = ls_ref[0]  # [2, P] f32: lo, step packed
    lo = ls[0:1, :]
    st = ls[1:2, :]
    refv = ref_ref[0]  # [C, P] f32
    # corr: mean_C(ref ⊙ samp) == colsum(sarr ⊙ (S @ ref))/C — the channel-
    # expanded reference is one MXU matmul, then no per-d S matmul
    ref_exp = (
        jax.lax.dot_general(
            S, refv.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "corr"
        else None
    )  # [L,P]

    d0 = c.astype(jnp.float32) * Dc

    # per-view geometry rows + band origins (tiny [1,P] fields, precomputed)
    geo = []
    for v in range(KV):
        s = g * KV + v
        if mode == "corr":
            rv = jax.lax.div(g, T * NC * B) * B + b
        else:
            rv = v * B + b
        rx = geom_ref[rv, 0] * X + geom_ref[rv, 1] * Y + geom_ref[rv, 2]
        ry = geom_ref[rv, 3] * X + geom_ref[rv, 4] * Y + geom_ref[rv, 5]
        rz = geom_ref[rv, 6] * X + geom_ref[rv, 7] * Y + geom_ref[rv, 8]
        tr = (geom_ref[rv, 9], geom_ref[rv, 10], geom_ref[rv, 11])
        um_f = umin_ref[s].astype(jnp.float32)
        vr_f = vrow_ref[s].astype(jnp.float32)
        wv = w_ref[0][v : v + 1, :] if mode == "fused" else None  # [1,P]
        geo.append((rx, ry, rz, tr, um_f, vr_f, wv))
        dma(g, v, buf).wait()

    def sample_one(v, hyp):
        """-> sarr [L, P]: per-pixel vertical-group samples at ``hyp`` [1,P]."""
        rx, ry, rz, (t0, t1, t2), um_f, vr_f, _ = geo[v]
        band = band_ref[buf, v]  # [cb, L]
        px = rx * hyp + t0
        py = ry * hyp + t1
        pz = rz * hyp + t2
        safe = pz > 1e-6
        inv = 1.0 / jnp.where(safe, pz, 1.0)
        uu = jnp.where(safe, px * inv, -1e9)
        vv = jnp.where(safe, py * inv, -1e9)
        lu = uu - um_f  # [1,P]
        lv = vv - vr_f
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu - x_idx))  # [cb,P]
        # hor[l,p] = Σ_x band[x,l]·wx[x,p] — lhs-transposed matmul, full MXU
        hor = jax.lax.dot_general(
            band, wx.astype(band.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L,P]
        return (hor * jnp.maximum(0.0, 1.0 - jnp.abs(lv - r_ids))).astype(mm_dtype)

    if mode in ("fused", "var"):
        nv = jnp.float32(Vs + 1)  # var counts the reference view too

        def body(d, _):
            hyp = lo + (d0 + d.astype(jnp.float32)) * st  # [1,P]
            if mode == "var":
                s_acc = refv
                q_acc = refv * refv
            else:
                acc = jnp.zeros((C, P), jnp.float32)
            for v in range(Vs):
                sarr = sample_one(v, hyp)
                # samp[c,p] = Σ_l S[l,c]·sarr[l,p]
                samp = jax.lax.dot_general(
                    S, sarr, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [C,P]
                if mode == "var":
                    s_acc = s_acc + samp
                    q_acc = q_acc + samp * samp
                else:
                    acc = acc + geo[v][6] * (refv * samp)
            if mode == "var":
                m = s_acc / nv
                acc = q_acc / nv - m * m  # E[x²] − E[x]² (msrednet.py:214-231)
            out_ref[d, 0] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, Dc, body, 0)
    else:
        row_d = jax.lax.broadcasted_iota(jnp.int32, (Dc, P), 0)

        def body(d, cols):
            hyp = lo + (d0 + d.astype(jnp.float32)) * st
            sarr = sample_one(0, hyp)
            col = jnp.sum(sarr.astype(jnp.float32) * ref_exp, axis=0, keepdims=True) / C
            return jnp.where(row_d == d, col, cols)

        cols = jax.lax.fori_loop(
            0, Dc, body, jnp.zeros((Dc, P), jnp.float32)
        )
        out_ref[0, 0] = cols.astype(out_ref.dtype)


def _prep_common(srcs: MergedSources, lo, step, D, d_chunk, tile_h, tile_w):
    C = srcs.c
    Lv = 128 // C
    B, h, w = lo.shape
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    hp, wp = h + ph, w + pw
    nty, ntx = hp // tile_h, wp // tile_w
    T = nty * ntx
    Dc = min(D, d_chunk)
    if D % Dc != 0:
        Dc = D  # no chunking when the chunk size does not divide D
    NC = D // Dc
    Wp = srcs.data.shape[2]
    Hp = srcs.data.shape[3] // C
    return C, Lv, B, h, w, hp, wp, nty, ntx, T, Dc, NC, Wp, Hp


def _geom_array(src_projs, ref_proj):
    """[Vs,B,4,4] + [B,4,4] -> rot [Vs,B,3,3], trans [Vs,B,3], flat [Vs*B,12]."""
    Vs, B = src_projs.shape[:2]
    rot, trans = jax.vmap(lambda sp: warp_transform(sp, ref_proj))(src_projs)
    flat = jnp.concatenate(
        [rot.reshape(Vs * B, 9), trans.reshape(Vs * B, 3)], axis=1
    ).astype(jnp.float32)
    return rot, trans, flat


def fold_grid(B: int, h: int, w: int, tile_h: int = 8, tile_w: int = 64):
    """The (B, nty, ntx, h, w) tile grid of a ``folded=True`` fused volume."""
    return (B, -(-h // tile_h), -(-w // tile_w), h, w)


def unfold_tiles(x: jnp.ndarray, grid: tuple, tile_h: int, tile_w: int):
    """[B*T, C, P] (one depth slice of a ``folded=True`` fused volume) ->
    [B, h, w, C]. Kept separate so a scan cell can unfold per slice — XLA
    then fuses the slice+transpose instead of materializing a transposed
    full volume (measured 0.6 s/map of pure data formatting at bench shapes)."""
    B, nty, ntx, h, w = grid
    C = x.shape[1]
    x = x.reshape(B, nty, ntx, C, tile_h, tile_w)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(B, nty * tile_h, ntx * tile_w, C)
    return x[:, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("num_depth", "d_chunk", "tile_h", "tile_w", "out_dtype",
                     "interpret", "folded"),
)
def fused_sweep_volume(
    ref_feat: jnp.ndarray,  # [B,h,w,C]
    srcs: MergedSources,
    src_projs: jnp.ndarray,  # [Vs,B,4,4]
    ref_proj: jnp.ndarray,  # [B,4,4]
    weights: jnp.ndarray,  # [B,h,w,Vs] visibility weights (unnormalized)
    lo: jnp.ndarray,  # [B,h,w]
    step: jnp.ndarray,  # [B,h,w]
    num_depth: int,
    d_chunk: int = 16,
    tile_h: int = 8,
    tile_w: int = 64,
    out_dtype=jnp.float32,
    interpret: bool = False,
    folded: bool = False,
) -> jnp.ndarray:
    """Visibility-weighted fused cost volume [D, B, h, w, C]:
    ``fused_d = Σ_v w_v (ref ⊙ warp_v(hyp_d)) / (1e-5 + Σ_v w_v)`` with
    ``hyp_d = lo + d*step`` (adamvs.py:497-512).

    ``folded=True`` returns the kernel-native ([D, B*T, C, P], grid) instead,
    for per-slice unfolding via ``unfold_tiles`` inside a depth scan."""
    D = num_depth
    C, Lv, B, h, w, hp, wp, nty, ntx, T, Dc, NC, Wp, Hp = _prep_common(
        srcs, lo, step, D, d_chunk, tile_h, tile_w
    )
    RB, cb = srcs.rb, srcs.cb
    Vs = srcs.data.shape[0]
    rot, trans, geom = _geom_array(src_projs, ref_proj)
    umin, vrow = _band_origins(
        rot, trans, lo, step, D, Dc, tile_h, tile_w, Hp, Wp, RB, cb, Lv, hp, wp
    )

    wn = (weights / (1e-5 + jnp.sum(weights, axis=-1, keepdims=True))).astype(
        jnp.float32
    )
    ls = jnp.stack([lo, step], axis=-1).astype(jnp.float32)  # [B,h,w,2]
    ls_f = _fold_tiles_t(ls, tile_h, tile_w)  # [BT,2,P]
    ref_f = _fold_tiles_t(ref_feat.astype(jnp.float32), tile_h, tile_w)  # [BT,C,P]
    w_f = _fold_tiles_t(wn, tile_h, tile_w)  # [BT,Vs,P]

    P = tile_h * tile_w
    G = B * NC * T
    mm_dtype = srcs.data.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, P), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec((1, C, P), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec((1, Vs, P), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (Dc, 1, C, P),
            lambda g, *_: (
                jax.lax.rem(jax.lax.div(g, T), NC), _row_bt(g, T, NC), 0, 0,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Vs, cb, RB * C), mm_dtype),
            pltpu.SemaphoreType.DMA((2, Vs)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, Vs=Vs, B=B, NC=NC, T=T, ntx=ntx, Dc=Dc, C=C,
            RB=RB, cb=cb, tile_h=tile_h, tile_w=tile_w, mode="fused",
            mm_dtype=mm_dtype,
        ),
        grid_spec=grid_spec,
        # default scoped-vmem cap is 16M; v5e has 128M physical VMEM and the
        # resident set here (bands + double-buffered out + [L,P] temps) is ~18M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((D, B * T, C, P), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=G * Vs * Dc * 2 * P * (cb + C) * RB * C,
            bytes_accessed=G * Vs * cb * RB * C * srcs.data.dtype.itemsize
            + D * B * T * P * C * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(umin, vrow, geom, ls_f, ref_f, w_f, srcs.data)

    if folded:
        return out  # [D, B*T, C, P]; grid = fold_grid(B, h, w, tile_h, tile_w)
    out = out.reshape(D, B, nty, ntx, C, tile_h, tile_w)
    out = out.transpose(0, 1, 2, 5, 3, 6, 4).reshape(D, B, hp, wp, C)
    return out[:, :, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("num_depth", "d_chunk", "tile_h", "tile_w", "out_dtype",
                     "interpret", "folded"),
)
def var_sweep_volume(
    ref_feat: jnp.ndarray,  # [B,h,w,C]
    srcs: MergedSources,
    src_projs: jnp.ndarray,  # [Vs,B,4,4]
    ref_proj: jnp.ndarray,  # [B,4,4]
    lo: jnp.ndarray,  # [B,h,w]
    step: jnp.ndarray,  # [B,h,w]
    num_depth: int,
    d_chunk: int = 16,
    tile_h: int = 8,
    tile_w: int = 64,
    out_dtype=jnp.float32,
    interpret: bool = False,
    folded: bool = False,
) -> jnp.ndarray:
    """Variance-aggregated cost volume [D, B, h, w, C] over {ref, warps}:
    ``var_d = E[x²] − E[x]²`` across the V views (msrednet.py:214-231), with
    ``hyp_d = lo + d*step``. Same kernel skeleton as ``fused_sweep_volume``."""
    D = num_depth
    C, Lv, B, h, w, hp, wp, nty, ntx, T, Dc, NC, Wp, Hp = _prep_common(
        srcs, lo, step, D, d_chunk, tile_h, tile_w
    )
    RB, cb = srcs.rb, srcs.cb
    Vs = srcs.data.shape[0]
    rot, trans, geom = _geom_array(src_projs, ref_proj)
    umin, vrow = _band_origins(
        rot, trans, lo, step, D, Dc, tile_h, tile_w, Hp, Wp, RB, cb, Lv, hp, wp
    )

    ls = jnp.stack([lo, step], axis=-1).astype(jnp.float32)  # [B,h,w,2]
    ls_f = _fold_tiles_t(ls, tile_h, tile_w)  # [BT,2,P]
    ref_f = _fold_tiles_t(ref_feat.astype(jnp.float32), tile_h, tile_w)  # [BT,C,P]

    P = tile_h * tile_w
    G = B * NC * T
    mm_dtype = srcs.data.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, P), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec((1, C, P), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (Dc, 1, C, P),
            lambda g, *_: (
                jax.lax.rem(jax.lax.div(g, T), NC), _row_bt(g, T, NC), 0, 0,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Vs, cb, RB * C), mm_dtype),
            pltpu.SemaphoreType.DMA((2, Vs)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, Vs=Vs, B=B, NC=NC, T=T, ntx=ntx, Dc=Dc, C=C,
            RB=RB, cb=cb, tile_h=tile_h, tile_w=tile_w, mode="var",
            mm_dtype=mm_dtype,
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((D, B * T, C, P), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=G * Vs * Dc * 2 * P * (cb + C) * RB * C,
            bytes_accessed=G * Vs * cb * RB * C * srcs.data.dtype.itemsize
            + D * B * T * P * C * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(umin, vrow, geom, ls_f, ref_f, srcs.data)

    if folded:
        return out  # [D, B*T, C, P]; grid = fold_grid(B, h, w, tile_h, tile_w)
    out = out.reshape(D, B, nty, ntx, C, tile_h, tile_w)
    out = out.transpose(0, 1, 2, 5, 3, 6, 4).reshape(D, B, hp, wp, C)
    return out[:, :, :h, :w]


def _row_bt(g, T, NC):
    """Grid step -> row index b*T + t of the folded per-tile arrays.

    Mosaic block index maps must stay simple arithmetic: python ``//``/``%``
    on traced values lower to sign-correcting jaxprs it rejects, so use the
    C-style lax forms (g >= 0 always)."""
    t = jax.lax.rem(g, T)
    b = jax.lax.div(g, T * NC)
    return b * T + t


@functools.partial(
    jax.jit,
    static_argnames=("num_depth", "d_chunk", "tile_h", "tile_w", "interpret"),
)
def corr_sweep_volume(
    ref_feat: jnp.ndarray,  # [B,h,w,C]
    srcs: MergedSources,
    src_projs: jnp.ndarray,  # [Vs,B,4,4]
    ref_proj: jnp.ndarray,  # [B,4,4]
    lo: jnp.ndarray,  # [B,h,w]
    step: jnp.ndarray,  # [B,h,w]
    num_depth: int,
    d_chunk: int = 16,
    tile_h: int = 8,
    tile_w: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-view channel-mean correlation volumes [Vs, B, h, w, D]:
    ``corr_v[d] = mean_C(ref ⊙ warp_v(hyp_d))`` (adamvs.py:268-288)."""
    D = num_depth
    C, Lv, B, h, w, hp, wp, nty, ntx, T, Dc, NC, Wp, Hp = _prep_common(
        srcs, lo, step, D, d_chunk, tile_h, tile_w
    )
    RB, cb = srcs.rb, srcs.cb
    Vs = srcs.data.shape[0]
    rot, trans, geom = _geom_array(src_projs, ref_proj)
    # corr DMA order: s = ((v*B + b)*NC + c)*T + t  (grid == DMA sequence)
    um_f, vr_f = _band_origins(
        rot, trans, lo, step, D, Dc, tile_h, tile_w, Hp, Wp, RB, cb, Lv, hp, wp
    )
    # _band_origins packs s' = ((b*NC + c)*T + t)*Vs + v; re-order to corr order
    um4 = um_f.reshape(B, NC, T, Vs)
    vr4 = vr_f.reshape(B, NC, T, Vs)
    umin = um4.transpose(3, 0, 1, 2).reshape(-1)
    vrow = vr4.transpose(3, 0, 1, 2).reshape(-1)

    ls = jnp.stack([lo, step], axis=-1).astype(jnp.float32)  # [B,h,w,2]
    ls_f = _fold_tiles_t(ls, tile_h, tile_w)  # [BT,2,P]
    ref_f = _fold_tiles_t(ref_feat.astype(jnp.float32), tile_h, tile_w)  # [BT,C,P]

    P = tile_h * tile_w
    G = Vs * B * NC * T
    mm_dtype = srcs.data.dtype

    def row_idx(g, *_):
        t = jax.lax.rem(g, T)
        b = jax.lax.rem(jax.lax.div(g, T * NC), B)
        return b * T + t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, P), lambda g, *_: (row_idx(g), 0, 0)),
            pl.BlockSpec((1, C, P), lambda g, *_: (row_idx(g), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            # out [NC, Vs*B*T, Dc, P]: depth on sublanes, pixels on lanes
            (1, 1, Dc, P),
            lambda g, *_: (
                jax.lax.rem(jax.lax.div(g, T), NC),
                jax.lax.div(g, T * NC) * T + jax.lax.rem(g, T),
                0,
                0,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, cb, RB * C), mm_dtype),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, Vs=Vs, B=B, NC=NC, T=T, ntx=ntx, Dc=Dc, C=C,
            RB=RB, cb=cb, tile_h=tile_h, tile_w=tile_w, mode="corr",
            mm_dtype=mm_dtype,
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((NC, Vs * B * T, Dc, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=G * Dc * 2 * P * (cb + C) * RB * C,
            bytes_accessed=G * cb * RB * C * srcs.data.dtype.itemsize
            + G * P * Dc * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(umin, vrow, geom, ls_f, ref_f, srcs.data)

    # [NC,VsBT,Dc,P] -> [Vs,B,h,w,D]
    out = out.transpose(1, 0, 2, 3).reshape(Vs, B, nty, ntx, D, tile_h, tile_w)
    out = out.transpose(0, 1, 2, 5, 3, 6, 4).reshape(Vs, B, hp, wp, D)
    return out[:, :, :h, :w]


# ---------------------------------------------------------------------------
# training support: custom VJPs for the fused sweep kernels
# ---------------------------------------------------------------------------
#
# The Pallas kernels define no derivative rules, so gradient passes previously
# had to fall back to the in-scan warp path (the round-3 training-throughput
# gap). These wrappers keep the FUSED kernel as the forward and implement the
# backward as the VJP of the mathematically-equivalent XLA composition
# (exact gather warp), recomputed at the same primals — "recompute-by-gather".
# Warp sample coordinates carry no gradient (reference computes grids under
# no_grad, module.py:531), so cotangents flow to features and weights only;
# projections and the hypothesis maps (lo, step) receive zeros.

from .warp import plane_sweep_warp as _gather_warp


def _xla_blocks(D, block):
    if D % block != 0:
        block = D
    return jnp.arange(D, dtype=jnp.float32).reshape(D // block, block)


def _xla_fused_volume(ref, srcs, weights, src_projs, ref_proj, lo, step,
                      D, block=8):
    """[D,B,h,w,C] visibility-weighted volume via the exact gather warp."""
    B, h, w, _ = ref.shape
    wn = weights / (1e-5 + jnp.sum(weights, axis=-1, keepdims=True))

    def one(d_blk):
        hyp = lo[:, None] + d_blk[None, :, None, None] * step[:, None]
        acc = jnp.float32(0.0)
        for v in range(srcs.shape[0]):
            warped = _gather_warp(srcs[v], src_projs[v], ref_proj, hyp)
            acc = acc + (ref[:, None] * warped) * wn[..., v : v + 1][:, None]
        return jnp.moveaxis(acc, 1, 0)

    out = jax.lax.map(one, _xla_blocks(D, block))  # [nb,blk,B,h,w,C]
    return out.reshape((D,) + out.shape[2:])


def _xla_var_volume(ref, srcs, src_projs, ref_proj, lo, step, D, block=8):
    """[D,B,h,w,C] variance volume over {ref, warps} via the gather warp."""
    nv = srcs.shape[0] + 1

    def one(d_blk):
        hyp = lo[:, None] + d_blk[None, :, None, None] * step[:, None]
        s = jnp.broadcast_to(
            ref[:, None], (ref.shape[0], d_blk.shape[0]) + ref.shape[1:]
        )
        sq = s * s
        for v in range(srcs.shape[0]):
            warped = _gather_warp(srcs[v], src_projs[v], ref_proj, hyp)
            s = s + warped
            sq = sq + warped * warped
        return jnp.moveaxis(sq / nv - (s / nv) ** 2, 1, 0)

    out = jax.lax.map(one, _xla_blocks(D, block))
    return out.reshape((D,) + out.shape[2:])


def _xla_corr_volume(ref, srcs, src_projs, ref_proj, lo, step, D, block=8):
    """[Vs,B,h,w,D] per-view channel-mean correlation via the gather warp."""
    def one(d_blk):
        hyp = lo[:, None] + d_blk[None, :, None, None] * step[:, None]
        outs = []
        for v in range(srcs.shape[0]):
            warped = _gather_warp(srcs[v], src_projs[v], ref_proj, hyp)
            outs.append(jnp.moveaxis(
                jnp.mean(ref[:, None] * warped, axis=-1), 1, -1))  # [B,h,w,blk]
        return jnp.stack(outs)  # [Vs,B,h,w,blk]

    out = jax.lax.map(one, _xla_blocks(D, block))  # [nb,Vs,B,h,w,blk]
    return jnp.concatenate(list(out), axis=-1)


def _merge(srcs, row_band, col_band, mm_dtype):
    return merge_sources(srcs, row_band=row_band, col_band=col_band,
                         mm_dtype=mm_dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def fused_sweep_volume_t(ref, srcs, weights, src_projs, ref_proj, lo, step,
                         num_depth, d_chunk=16, row_band=12, col_band=128,
                         mm_dtype=jnp.bfloat16, out_dtype=jnp.float32,
                         interpret=False):
    """Differentiable fused sweep: Pallas forward ([D,B,h,w,C], unfolded),
    gather-recompute backward. ``srcs`` is the RAW [Vs,B,h,w,C] stack."""
    srcs_m = _merge(srcs, row_band, col_band, mm_dtype)
    return fused_sweep_volume(
        ref, srcs_m, src_projs, ref_proj, weights, lo, step,
        num_depth=num_depth, d_chunk=d_chunk, out_dtype=out_dtype,
        interpret=interpret,
    )


def _fused_t_fwd(ref, srcs, weights, src_projs, ref_proj, lo, step,
                 num_depth, d_chunk, row_band, col_band, mm_dtype, out_dtype,
                 interpret):
    out = fused_sweep_volume_t(
        ref, srcs, weights, src_projs, ref_proj, lo, step, num_depth,
        d_chunk, row_band, col_band, mm_dtype, out_dtype, interpret,
    )
    return out, (ref, srcs, weights, src_projs, ref_proj, lo, step)


def _fused_t_bwd(num_depth, d_chunk, row_band, col_band, mm_dtype, out_dtype,
                 interpret, res, g):
    ref, srcs, weights, src_projs, ref_proj, lo, step = res
    _, vjp = jax.vjp(
        lambda r, s, w: _xla_fused_volume(
            r, s, w, src_projs, ref_proj, lo, step, num_depth),
        ref, srcs, weights,
    )
    dref, dsrcs, dw = vjp(g.astype(jnp.float32))
    # cotangent dtypes must match the primals (bf16 features otherwise meet
    # f32 cotangents inside the upstream conv VJPs)
    return (dref.astype(ref.dtype), dsrcs.astype(srcs.dtype),
            dw.astype(weights.dtype), jnp.zeros_like(src_projs),
            jnp.zeros_like(ref_proj), jnp.zeros_like(lo), jnp.zeros_like(step))


fused_sweep_volume_t.defvjp(_fused_t_fwd, _fused_t_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12)
)
def var_sweep_volume_t(ref, srcs, src_projs, ref_proj, lo, step,
                       num_depth, d_chunk=16, row_band=12, col_band=128,
                       mm_dtype=jnp.bfloat16, out_dtype=jnp.float32,
                       interpret=False):
    """Differentiable variance sweep (msrednet), gather-recompute backward."""
    srcs_m = _merge(srcs, row_band, col_band, mm_dtype)
    return var_sweep_volume(
        ref, srcs_m, src_projs, ref_proj, lo, step,
        num_depth=num_depth, d_chunk=d_chunk, out_dtype=out_dtype,
        interpret=interpret,
    )


def _var_t_fwd(ref, srcs, src_projs, ref_proj, lo, step, num_depth, d_chunk,
               row_band, col_band, mm_dtype, out_dtype, interpret):
    out = var_sweep_volume_t(
        ref, srcs, src_projs, ref_proj, lo, step, num_depth, d_chunk,
        row_band, col_band, mm_dtype, out_dtype, interpret,
    )
    return out, (ref, srcs, src_projs, ref_proj, lo, step)


def _var_t_bwd(num_depth, d_chunk, row_band, col_band, mm_dtype, out_dtype,
               interpret, res, g):
    ref, srcs, src_projs, ref_proj, lo, step = res
    _, vjp = jax.vjp(
        lambda r, s: _xla_var_volume(
            r, s, src_projs, ref_proj, lo, step, num_depth),
        ref, srcs,
    )
    dref, dsrcs = vjp(g.astype(jnp.float32))
    return (dref.astype(ref.dtype), dsrcs.astype(srcs.dtype),
            jnp.zeros_like(src_projs), jnp.zeros_like(ref_proj),
            jnp.zeros_like(lo), jnp.zeros_like(step))


var_sweep_volume_t.defvjp(_var_t_fwd, _var_t_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def corr_sweep_volume_t(ref, srcs, src_projs, ref_proj, lo, step,
                        num_depth, d_chunk=16, row_band=12, col_band=128,
                        mm_dtype=jnp.bfloat16, interpret=False):
    """Differentiable per-view correlation sweep, gather-recompute backward."""
    srcs_m = _merge(srcs, row_band, col_band, mm_dtype)
    return corr_sweep_volume(
        ref, srcs_m, src_projs, ref_proj, lo, step,
        num_depth=num_depth, d_chunk=d_chunk, interpret=interpret,
    )


def _corr_t_fwd(ref, srcs, src_projs, ref_proj, lo, step, num_depth, d_chunk,
                row_band, col_band, mm_dtype, interpret):
    out = corr_sweep_volume_t(
        ref, srcs, src_projs, ref_proj, lo, step, num_depth, d_chunk,
        row_band, col_band, mm_dtype, interpret,
    )
    return out, (ref, srcs, src_projs, ref_proj, lo, step)


def _corr_t_bwd(num_depth, d_chunk, row_band, col_band, mm_dtype, interpret,
                res, g):
    ref, srcs, src_projs, ref_proj, lo, step = res
    _, vjp = jax.vjp(
        lambda r, s: _xla_corr_volume(
            r, s, src_projs, ref_proj, lo, step, num_depth),
        ref, srcs,
    )
    dref, dsrcs = vjp(g.astype(jnp.float32))
    return (dref.astype(ref.dtype), dsrcs.astype(srcs.dtype),
            jnp.zeros_like(src_projs), jnp.zeros_like(ref_proj),
            jnp.zeros_like(lo), jnp.zeros_like(step))


corr_sweep_volume_t.defvjp(_corr_t_fwd, _corr_t_bwd)
