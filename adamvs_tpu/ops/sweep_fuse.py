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
    if mode == "fused":
        lo_ref, step_ref, ref_ref, w_ref, feat_ref, out_ref, band_ref, acc_ref, sem = refs
    else:
        lo_ref, step_ref, ref_ref, feat_ref, out_ref, band_ref, sem = refs
        w_ref = acc_ref = None
    g = pl.program_id(0)
    L = RB * C
    P = tile_h * tile_w

    # grid decode; in corr mode the leading grid axis is the view
    if mode == "corr":
        t = jax.lax.rem(g, T)
        r = jax.lax.div(g, T)
        c = jax.lax.rem(r, NC)
        r = jax.lax.div(r, NC)
        b = jax.lax.rem(r, B)
        SEQ = 1  # one band per grid step
    else:
        t = jax.lax.rem(g, T)
        r = jax.lax.div(g, T)
        c = jax.lax.rem(r, NC)
        b = jax.lax.div(r, NC)
        SEQ = Vs
    tx = jax.lax.rem(t, ntx)
    ty = jax.lax.div(t, ntx)

    nseq = pl.num_programs(0) * SEQ

    def dma(s, slot):
        um = pl.multiple_of(umin_ref[s], 8)
        vlane = pl.multiple_of(vrow_ref[s] * C, 128)
        if mode == "corr":
            gs = s
            v_s = jax.lax.div(jax.lax.div(gs, T), NC * B)
            b_s = jax.lax.rem(jax.lax.div(gs, T * NC), B)
        else:
            v_s = jax.lax.rem(s, Vs)
            b_s = jax.lax.div(s, Vs * NC * T)
        return pltpu.make_async_copy(
            feat_ref.at[v_s, b_s, pl.ds(um, cb), pl.ds(vlane, L)],
            band_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    # constant index fields
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (P, cb), 1).astype(jnp.float32)
    r_ids = (jax.lax.broadcasted_iota(jnp.int32, (P, L), 1) // C).astype(jnp.float32)
    # group-summation matrix S[(r,c'),c] = [c'==c] — vertical combine as MXU
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0) % C
    col_c = jax.lax.broadcasted_iota(jnp.int32, (L, C), 1)
    S = (lane_c == col_c).astype(mm_dtype)

    # per-pixel reference coordinates of this tile
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    X = (tx * tile_w + jax.lax.rem(pix, tile_w)).astype(jnp.float32)
    Y = (ty * tile_h + jax.lax.div(pix, tile_w)).astype(jnp.float32)
    lo = lo_ref[0][:, None]
    st = step_ref[0][:, None]
    refv = ref_ref[0]  # [P, C] f32

    d0 = (c * Dc).astype(jnp.float32) if hasattr(c, "astype") else float(c * Dc)

    corr_cols = []
    for v in range(Vs):
        s = g * SEQ + v
        nxt = s + 1

        @pl.when(nxt < nseq)
        def _():
            dma(nxt, jax.lax.rem(nxt, 2)).start()

        if mode == "corr":
            rv = jax.lax.div(jax.lax.div(g, T), NC * B) * B + b
        else:
            rv = v * B + b
        r00 = geom_ref[rv, 0]
        r01 = geom_ref[rv, 1]
        r02 = geom_ref[rv, 2]
        r10 = geom_ref[rv, 3]
        r11 = geom_ref[rv, 4]
        r12 = geom_ref[rv, 5]
        r20 = geom_ref[rv, 6]
        r21 = geom_ref[rv, 7]
        r22 = geom_ref[rv, 8]
        t0 = geom_ref[rv, 9]
        t1 = geom_ref[rv, 10]
        t2 = geom_ref[rv, 11]
        rx = r00 * X + r01 * Y + r02  # [P,1]
        ry = r10 * X + r11 * Y + r12
        rz = r20 * X + r21 * Y + r22

        um_f = umin_ref[s].astype(jnp.float32)
        vr_f = vrow_ref[s].astype(jnp.float32)
        if mode == "fused":
            wv = w_ref[0][:, v][:, None]  # [P,1]

        dma(s, jax.lax.rem(s, 2)).wait()
        band = band_ref[jax.lax.rem(s, 2)]  # [cb, L]

        for d in range(Dc):
            hyp = lo + (d0 + d) * st  # [P,1]
            px = rx * hyp + t0
            py = ry * hyp + t1
            pz = rz * hyp + t2
            safe = pz > 1e-6
            inv = 1.0 / jnp.where(safe, pz, 1.0)
            uu = jnp.where(safe, px * inv, -1e9)
            vv = jnp.where(safe, py * inv, -1e9)
            lu = uu - um_f
            lv = vv - vr_f
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(lu - x_idx))  # [P,cb]
            hor = jax.lax.dot_general(
                wx.astype(band.dtype), band, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P,L]
            sarr = (hor * jnp.maximum(0.0, 1.0 - jnp.abs(lv - r_ids))).astype(mm_dtype)
            samp = jax.lax.dot_general(
                sarr, S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P,C]
            if mode == "corr":
                corr_cols.append(jnp.sum(refv * samp, axis=1, keepdims=True) / C)
            else:
                contrib = wv * (refv * samp)
                if v == 0:
                    acc_ref[:, d * C : (d + 1) * C] = contrib
                else:
                    acc_ref[:, d * C : (d + 1) * C] += contrib
        if mode == "corr":
            break  # the view loop is the grid axis in corr mode

    if mode == "corr":
        out_ref[0] = jnp.concatenate(corr_cols, axis=1).astype(out_ref.dtype)
    else:
        for d in range(Dc):
            out_ref[d, 0] = acc_ref[:, d * C : (d + 1) * C].astype(out_ref.dtype)


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


@functools.partial(
    jax.jit,
    static_argnames=("num_depth", "d_chunk", "tile_h", "tile_w", "out_dtype",
                     "interpret"),
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
) -> jnp.ndarray:
    """Visibility-weighted fused cost volume [D, B, h, w, C]:
    ``fused_d = Σ_v w_v (ref ⊙ warp_v(hyp_d)) / (1e-5 + Σ_v w_v)`` with
    ``hyp_d = lo + d*step`` (adamvs.py:497-512)."""
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
    lo_f = _fold_tiles(lo.astype(jnp.float32), tile_h, tile_w)
    st_f = _fold_tiles(step.astype(jnp.float32), tile_h, tile_w)
    ref_f = _fold_tiles(ref_feat.astype(jnp.float32), tile_h, tile_w)
    w_f = _fold_tiles(wn, tile_h, tile_w)

    P = tile_h * tile_w
    G = B * NC * T
    mm_dtype = srcs.data.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, P), lambda g, *_: (_row_bt(g, T, NC), 0)),
            pl.BlockSpec((1, P), lambda g, *_: (_row_bt(g, T, NC), 0)),
            pl.BlockSpec((1, P, C), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec((1, P, Vs), lambda g, *_: (_row_bt(g, T, NC), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (Dc, 1, P, C), lambda g, *_: (g // T % NC, _row_bt(g, T, NC), 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cb, RB * C), mm_dtype),
            pltpu.VMEM((P, Dc * C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, Vs=Vs, B=B, NC=NC, T=T, ntx=ntx, Dc=Dc, C=C,
            RB=RB, cb=cb, tile_h=tile_h, tile_w=tile_w, mode="fused",
            mm_dtype=mm_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, B * T, P, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=G * Vs * Dc * 2 * P * (cb + C) * RB * C,
            bytes_accessed=G * Vs * cb * RB * C * srcs.data.dtype.itemsize
            + D * B * T * P * C * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(umin, vrow, geom, lo_f, st_f, ref_f, w_f, srcs.data)

    out = out.reshape(D, B, nty, ntx, tile_h, tile_w, C)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(D, B, hp, wp, C)
    return out[:, :, :h, :w]


def _row_bt(g, T, NC):
    """Grid step -> row index b*T + t of the folded per-tile arrays."""
    t = g % T
    b = g // (T * NC)
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

    lo_f = _fold_tiles(lo.astype(jnp.float32), tile_h, tile_w)
    st_f = _fold_tiles(step.astype(jnp.float32), tile_h, tile_w)
    ref_f = _fold_tiles(ref_feat.astype(jnp.float32), tile_h, tile_w)

    P = tile_h * tile_w
    G = Vs * B * NC * T
    mm_dtype = srcs.data.dtype

    def row_idx(g, *_):
        t = g % T
        b = g // (T * NC) % B
        return b * T + t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, P), lambda g, *_: (row_idx(g), 0)),
            pl.BlockSpec((1, P), lambda g, *_: (row_idx(g), 0)),
            pl.BlockSpec((1, P, C), lambda g, *_: (row_idx(g), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            # row = (v*B + b)*T + t, chunk block c
            (1, P, Dc),
            lambda g, *_: ((g // (T * NC)) * T + g % T, 0, g // T % NC),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cb, RB * C), mm_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, Vs=Vs, B=B, NC=NC, T=T, ntx=ntx, Dc=Dc, C=C,
            RB=RB, cb=cb, tile_h=tile_h, tile_w=tile_w, mode="corr",
            mm_dtype=mm_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vs * B * T, P, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=G * Dc * 2 * P * (cb + C) * RB * C,
            bytes_accessed=G * cb * RB * C * srcs.data.dtype.itemsize
            + G * P * Dc * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(umin, vrow, geom, lo_f, st_f, ref_f, srcs.data)

    out = out.reshape(Vs, B, nty, ntx, tile_h, tile_w, D)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(Vs, B, hp, wp, D)
    return out[:, :, :h, :w]
