"""Fused recurrent-regularizer sweep: the whole AdaRedCell depth scan in one
Pallas kernel.

The XLA scan path (models/adamvs.py `_AdaRegIdxStreamCell`) pays, per depth
slice, the scan's dynamic-slice of the fused volume, fold->NHWC relayouts, and
conv-input layout copies around the small-channel GRU convs — measured 1.0+
s/map of the 2.2 s/map total at bench shapes (BASELINE.md round-3 trace
attribution). This kernel eliminates those classes: the depth recurrence runs
entirely on-chip, one grid step per (depth, row-tile), with

- GRU carries ping-ponged between two HBM buffers by depth parity (the grid is
  sequential on a TPU core, so every tile of step d-1 completes before step d
  reads its halo rows — cross-tile conv halos are exact, not approximated);
  d == 0 uses in-kernel zero states and zeroes the out-of-image margin rows
  once, so the carry buffers need no host-side initialization (works on raw
  uninitialized HBM and under ``force_tpu_interpret_mode``'s NaN fill);
- full-width row tiles DMA'd whole, with the compute inside an in-kernel
  ``fori_loop`` over ~512-lane column panels (XPAD-lane halos per side, all
  slice offsets 128-aligned): Mosaic's unrolled vector-op count per op is
  bounded by the panel window, not the image width — the monolithic
  full-width body was compile-intractable at production widths (the remote
  Mosaic compiler was SIGKILLed at 768-2048 lanes, BASELINE.md round-4);
- every 3x3 conv expressed as ONE [Cout, 9C] x [9C, R*W] MXU contraction
  (rows = nine rolled copies of the operand, dx-major dy-minor), and each
  stride-2 transposed conv as one [4Cout, 4C] phase contraction — K-dim
  utilization, not FLOPs, bounds MXU throughput at these channel counts;
- the half-resolution level lives in a rows-compact / lanes-SPARSE layout:
  rows are decimated by a (supported) sublane-merge reshape, but valid samples
  stay at even lanes of the full-width lane dimension — Mosaic has no lane
  compaction/interleave (strided slices don't lower; lane gathers miscompile),
  so half-res conv taps are lane-rolls of +-2 and the up-deconv re-densifies
  with parity-masked rolls instead of an interleave (2x redundant MXU work on
  the 2b-channel level, zero relayout);
- the 2x-upsampling head emits a lane-phase-split volume [D, B, 2, 2R, W]
  (rows interleaved in-kernel via the supported sublane reshape); the final
  [.., 2R, 2W] interleave is one XLA reshape outside the kernel;
- image-boundary exactness by masking every biased intermediate to the real
  [h, w] extent (conv zero-padding semantics: out-of-image values are zero,
  so taps of real pixels read exactly what XLA's SAME/torch padding reads).

Cell math mirrors nn/costreg.py::AdaRedCell (reference CostRegNetRED /
SliceCostRegNetRED, adamvs.py:157-195,400-424): conv->GRU(b)->stride-2
conv->GRU(2b)->deconv+skip->head (2x deconv when ``up``). The kernel emits the
regularized cost volume [D, B, oh, ow]; softmax depth regression over it
happens outside (ops/regression.py math), where XLA fuses it into two
bandwidth-bound passes.

Gradients are not defined; the model uses this path for inference only (the
training path keeps the exact XLA scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# full-res halo rows per side (>= total one-step receptive field ~8, and
# 2x the half-res halo so the half-res windows stay 8-aligned)
HALO = 16
# lane pad per side of the padded spatial layout; doubles as the per-panel
# lane halo (the in-step chain's lane receptive field is ~12, so 128 is
# ample) and keeps every panel slice offset 128-aligned
XPAD = 128
PANEL_W = 512  # interior lanes per in-kernel column panel


def _panel_width(w: int) -> int:
    """Interior panel width: PANEL_W (override: ADAMVS_RED_PANEL_W, a
    multiple of 128 — larger panels amortize the 2*XPAD lane-halo
    overcompute but grow Mosaic's per-op unroll count), shrunk
    (128-aligned) for narrow images so tiny inputs don't pay a full
    512-lane panel."""
    import os

    pw = PANEL_W
    env = os.environ.get("ADAMVS_RED_PANEL_W", "")
    if env:
        try:
            pw = int(env)
        except ValueError:
            raise ValueError(
                f"ADAMVS_RED_PANEL_W={env!r} is not an integer") from None
        if pw < 128 or pw % 128:
            raise ValueError(
                f"ADAMVS_RED_PANEL_W={pw} invalid: must be a multiple of "
                "128 and >= 128")
    return min(pw, -(-w // 128) * 128)


def spatial_dims(h: int, w: int, tile_rows: int) -> tuple[int, int, int]:
    """(nty, Hps, Wps) of the padded channel-major spatial layout
    [.., C, Hps, Wps]: rows = HALO + nty*tile_rows + HALO, lanes =
    XPAD + npanels*panel_w + XPAD — the kernel loops over column panels
    whose (halo'd) windows tile this exactly, and every in-kernel slice
    offset stays 128-aligned."""
    nty = -(-h // tile_rows)
    hps = HALO + nty * tile_rows + HALO
    ptw = _panel_width(w)
    npan = -(-w // ptw)
    wps = 2 * XPAD + npan * ptw
    return nty, hps, wps


def pick_tile_rows(w: int) -> int:
    """Row-tile height: large tiles amortize the halo overcompute
    ((TH+2*HALO)/TH) at the cost of VMEM. The in-kernel panel loop bounds
    the Mosaic compiler's per-op tile count regardless of width, so the
    default no longer shrinks with W. Override with ADAMVS_RED_TILE_ROWS."""
    import os

    env = os.environ.get("ADAMVS_RED_TILE_ROWS", "")
    if env:
        try:
            th = int(env)
        except ValueError:
            raise ValueError(
                f"ADAMVS_RED_TILE_ROWS={env!r} is not an integer") from None
        # th//2 half-res windows + sublane-merge alignment need a multiple of
        # 8; margin writes source from h1out[:HALO] need th >= HALO
        if th < HALO or th % 8:
            raise ValueError(
                f"ADAMVS_RED_TILE_ROWS={th} invalid: must be a multiple of 8 "
                f"and >= {HALO}")
        return th
    # 96 over 48: halo overcompute (th+2*HALO)/th drops 1.67 -> 1.33; measured
    # x0.80 stage-2 kernel time at bench geometry (BASELINE.md round-5)
    return 96


def spatialize(vol: jnp.ndarray, tile_rows: int) -> jnp.ndarray:
    """[D, B, h, w, C] -> padded channel-major [D, B, C, Hps, Wps] (tests /
    non-fused producers; the fused sweep kernel writes this layout directly)."""
    D, B, h, w, C = vol.shape
    _, hps, wps = spatial_dims(h, w, tile_rows)
    v = jnp.transpose(vol, (0, 1, 4, 2, 3))
    return jnp.pad(
        v, ((0, 0), (0, 0), (0, 0), (HALO, hps - h - HALO), (XPAD, wps - w - XPAD))
    )


def refold_spatial(
    folded: jnp.ndarray,  # [D, B*T, C, P] (ops/sweep_fuse.py folded=True)
    grid: tuple,  # fold_grid(B, h, w): (B, nty, ntx, h, w)
    tile_h: int = 8,
    tile_w: int = 64,
    tile_rows: int = 0,
) -> jnp.ndarray:
    """Fused-sweep folded volume -> the padded channel-major [D, B, C, Hps,
    Wps] layout ``ada_red_scan`` reads: ONE bulk relayout per stage instead of
    a per-slice unfold+transpose inside the depth scan. Tile-pad pixels
    (rows >= h, cols >= w) carry sweep-kernel zeros; the scan kernel masks to
    the true [h, w] extent regardless."""
    B, nty_f, ntx_f, h, w = grid
    D, _, C, _ = folded.shape
    th = tile_rows or pick_tile_rows(w)
    _, hps, wps = spatial_dims(h, w, th)
    x = folded.reshape(D, B, nty_f, ntx_f, C, tile_h, tile_w)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)
    hp, wp = nty_f * tile_h, ntx_f * tile_w
    x = x.reshape(D, B, C, hp, wp)
    return jnp.pad(
        x,
        ((0, 0), (0, 0), (0, 0), (HALO, hps - HALO - hp), (XPAD, wps - XPAD - wp)),
    )


def pack_red_params(params: dict, up: bool) -> dict:
    """AdaRedCell flax params -> matmul-ready weight matrices.

    3x3 convs: ONE [Cout, 9*Cin] matrix, W[o, (dx*3 + dy)*Cin + ci] =
    k[dy, dx, ci, o] — the kernel contracts it against a stack of nine
    rolled operand copies in the same (dx-major, dy-minor) order, so the
    whole conv is a single MXU call with K = 9*Cin (3x the K-utilization of
    a per-kernel-column split at these tiny channel counts).

    Stride-2 transposed convs: ONE [4*Cout, 4*Cin] matrix of the 4 output
    phases (phase-major rows), phase p = 2a + c producing out[2i+a, 2j+c];
    tap slots ordered by input shift (dy, dx) in [(0,0), (0,1), (1,0),
    (1,1)] (conv2d_transpose_shift semantics: k=3, s=2, torch padding 1,
    output_padding 1 -> phase 0 reads tap ky=1 at shift 0, phase 1 reads
    ky=0 at shift 0 and ky=2 at shift 1).
    """

    def w3(k):
        co = k.shape[3]
        return jnp.transpose(k, (3, 1, 0, 2)).reshape(co, 9 * k.shape[2])

    def wdec(k):
        ci, co = k.shape[2], k.shape[3]
        out = jnp.zeros((4, co, 4 * ci), k.dtype)
        taps = {0: [(1, 0)], 1: [(0, 0), (2, 1)]}
        for a in (0, 1):
            for c in (0, 1):
                for ky, dy in taps[a]:
                    for kx, dx in taps[c]:
                        s = dy * 2 + dx
                        out = out.at[2 * a + c, :, s * ci : (s + 1) * ci].set(
                            k[ky, kx].T
                        )
        return out.reshape(4 * co, 4 * ci)

    def b2(v):
        return v.reshape(-1, 1)

    g1, n1 = params["ConvGRUCell_0"]["FastConv_0"], params["ConvGRUCell_0"]["FastConv_1"]
    g2, n2 = params["ConvGRUCell_1"]["FastConv_0"], params["ConvGRUCell_1"]["FastConv_1"]
    head = params["FastConvTranspose_1" if up else "FastConv_0"]
    return {
        "wc1": w3(params["ConvReLU_0"]["FastConv_0"]["kernel"]),
        "wg1": w3(g1["kernel"]), "bg1": b2(g1["bias"]),
        "wn1": w3(n1["kernel"]), "bn1": b2(n1["bias"]),
        "wc2": w3(params["ConvReLU_1"]["FastConv_0"]["kernel"]),
        "wg2": w3(g2["kernel"]), "bg2": b2(g2["bias"]),
        "wn2": w3(n2["kernel"]), "bn2": b2(n2["bias"]),
        "wu1": wdec(params["FastConvTranspose_0"]["kernel"]),
        "bu1": b2(params["FastConvTranspose_0"]["bias"]),
        "wh": (wdec if up else w3)(head["kernel"]),
        "bh": b2(head["bias"]),
    }


def _roll(x, shift, axis):
    """np.roll semantics; pltpu.roll rejects negative shifts."""
    if shift < 0:
        shift += x.shape[axis]
    return pltpu.roll(x, shift, axis=axis)


def _mm_precision(dt):
    """MXU precision for contractions whose operands are cast to ``dt``."""
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT


def _conv3(x, w9, dt, lane_step: int = 1):
    """x [C, R, W] (f32, W % 128 == 0), w9 [Cout, 9C] -> f32 [Cout, R*W].

    Tap (dy, dx) reads x[r-1+dy, p-(1-dx)*lane_step]; rolls wrap, corrupting
    only window edge rows/lanes, which stay inside the halo / lane-pad
    margins. ``lane_step=2`` is the lanes-sparse half-res form: valid samples
    sit at even lanes, so a half-res column step is two lanes.

    The nine rolled copies are stacked (dx-major, dy-minor — the
    pack_red_params weight order) and contracted in ONE MXU call with
    K = 9C: at 8-32 channels this triples the MXU K-utilization vs a
    per-kernel-column split.

    In-kernel values stay f32 — Mosaic's rotate only exists for 32-bit data —
    and are cast to the compute dtype ``dt`` per rolled piece right before the
    MXU contraction (bf16 matmul speed, f32 vector ops). For f32 ``dt`` the
    contraction requests HIGHEST precision: the MXU's DEFAULT lowers f32
    matmuls through bf16 passes (~1e-3 relative), which would fail f32
    parity with the XLA scan path."""
    C, R, W = x.shape
    pieces = []
    for dx in range(3):
        xr = x if dx == 1 else _roll(x, (1 - dx) * lane_step, axis=2)
        pieces += [
            _roll(xr, 1, axis=1).astype(dt), xr.astype(dt),
            _roll(xr, -1, axis=1).astype(dt),
        ]
    stack = jnp.concatenate(pieces, axis=0).reshape(9 * C, R * W)
    return jax.lax.dot_general(
        w9[:].astype(dt), stack,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_mm_precision(dt),
    )


def _rows_dec2(x):
    """Even rows: [C, R, W] -> [C, R//2, W] via the sublane-merge reshape
    (row pair -> one double-width row; even row = first W lanes)."""
    C, R, W = x.shape
    return x.reshape(C, R // 2, 2 * W)[:, :, :W]


def _ilv_rows(a, b):
    """Row interleave via the inverse sublane-merge reshape: out[2q] = a[q],
    out[2q+1] = b[q]."""
    C, R, W = a.shape
    return jnp.concatenate([a, b], axis=2).reshape(C, 2 * R, W)


def _lane_parity_masks(shape, dt):
    """(even, odd) lane masks of [R, W] broadcast over channels."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    even = (lane % 2 == 0).astype(dt)[None]
    return even, 1.0 - even


def _phase_mm(x4, w4, bias, dt, co, R, W):
    """The 4 output-phase contractions of a stride-2 transposed conv in ONE
    MXU call: x4 [4C, R*W] tap stack, w4 [4co, 4C] (phase-major rows) ->
    list of 4 f32 [co, R, W] phase results."""
    t = jax.lax.dot_general(
        w4[:].astype(dt), x4,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_mm_precision(dt),
    )
    t = (t + jnp.tile(bias, (4, 1))).reshape(4, co, R, W)
    return [t[p] for p in range(4)]


def _tap_stack(x, dt, lane_shift: int):
    """Deconv tap stack [4C, R*W] in slot order (0,0),(0,1),(1,0),(1,1):
    x f32, rolls f32, per-piece cast to ``dt``."""
    C, R, W = x.shape
    sx = _roll(x, -lane_shift, axis=2)
    return jnp.concatenate(
        [x.astype(dt), sx.astype(dt), _roll(x, -1, axis=1).astype(dt),
         _roll(sx, -1, axis=1).astype(dt)], axis=0
    ).reshape(4 * C, R * W)


def _deconv_half_to_full(x, w4, bias, dt):
    """Stride-2 transposed conv from the rows-compact / lanes-sparse half-res
    layout back to dense full res: x [C, Rh, W] f32 (valid at even lanes) ->
    f32 [co, 2*Rh, W] dense. Tap shifts: one compact row = one half-res row,
    two lanes = one half-res column. Phase p = 2a + c writes out[2i+a, .]:
    c = 0 lands on even lanes where the phase result already sits; c = 1 is a
    +1 lane roll onto odd lanes — parity-masked adds replace the (unsupported)
    lane interleave."""
    C, Rh, W = x.shape
    co = w4.shape[0] // 4
    x4 = _tap_stack(x, dt, 2)
    ph = _phase_mm(x4, w4, bias, dt, co, Rh, W)
    even, odd = _lane_parity_masks((Rh, W), jnp.float32)
    top = ph[0] * even + _roll(ph[1], 1, axis=2) * odd
    bot = ph[2] * even + _roll(ph[3], 1, axis=2) * odd
    return _ilv_rows(top, bot)


def _deconv_up_phases(x, w4, bias, dt):
    """Stride-2 transposed conv from dense full res to 2x, lane-phase-split:
    x [C, R, W] f32 -> (c0, c1), each f32 [co, 2R, W], where the true output
    is out[2i+a, 2j+c] = (c_c)[2i+a, j] — rows interleaved in-kernel, the lane
    interleave deferred to one XLA reshape outside."""
    C, R, W = x.shape
    co = w4.shape[0] // 4
    x4 = _tap_stack(x, dt, 1)
    ph = _phase_mm(x4, w4, bias, dt, co, R, W)
    return _ilv_rows(ph[0], ph[2]), _ilv_rows(ph[1], ph[3])


def _red_scan_kernel(
    vol_ref,  # HBM [D, B, Cin, Hps, Wps]
    wc1, wg1, bg1, wn1, bn1, wc2, wg2, bg2, wn2, bn2, wu1, bu1, wh, bh,
    cost_ref,  # VMEM out block
    h1_ref, h2_ref,  # HBM carry ping-pong [2, B, ch, rows, lanes]
    vwin, h1win, h2win, h1out, h2out, sems,
    *, cin: int, base: int, up: bool, th: int, h: int, w: int,
    hps: int, wps: int, ptw: int, npan: int, dt,
):
    b_i = pl.program_id(0)
    d = pl.program_id(1)
    ty = pl.program_id(2)
    nty = pl.num_programs(2)
    bch = base
    R = th + 2 * HALO
    Rh = th // 2 + HALO
    PW = ptw + 2 * XPAD  # panel window width (interior + lane halos)
    pr = jax.lax.rem(d, 2)
    pw = 1 - pr
    row0 = ty * th
    rowh0 = ty * (th // 2)

    cp_v = pltpu.make_async_copy(
        vol_ref.at[d, b_i, :, pl.ds(row0, R), :], vwin, sems.at[0]
    )
    cp_h1 = pltpu.make_async_copy(
        h1_ref.at[pr, b_i, :, pl.ds(row0, R), :], h1win, sems.at[1]
    )
    cp_h2 = pltpu.make_async_copy(
        h2_ref.at[pr, b_i, :, pl.ds(rowh0, Rh), :], h2win, sems.at[2]
    )
    cp_v.start()

    # d == 0: the carry buffers are uninitialized HBM — use zero states
    # (reference zero-init, adamvs.py:175-176) instead of reading, and zero
    # the never-again-written halo margin rows of BOTH parities once (their
    # exact value for out-of-image rows is 0 for every d, so one write
    # suffices; the grid is sequential, so step (b, 0, 0) completes before
    # any (b, 1, ty) reads the margins).
    @pl.when(d > 0)
    def _():
        cp_h1.start()
        cp_h2.start()

    @pl.when((d == 0) & (ty == 0))
    def _():
        h1out[:] = jnp.zeros_like(h1out)
        h2out[:] = jnp.zeros_like(h2out)
        for par in (0, 1):
            for r0 in (0, HALO + nty * th):
                cp = pltpu.make_async_copy(
                    h1out.at[:, :HALO, :],
                    h1_ref.at[par, b_i, :, pl.ds(r0, HALO), :],
                    sems.at[3],
                )
                cp.start()
                cp.wait()
            for r0 in (0, HALO // 2 + nty * (th // 2)):
                cp = pltpu.make_async_copy(
                    h2out.at[:, : HALO // 2, :],
                    h2_ref.at[par, b_i, :, pl.ds(r0, HALO // 2), :],
                    sems.at[3],
                )
                cp.start()
                cp.wait()

    @pl.when(d == 0)
    def _():
        h1win[:] = jnp.zeros_like(h1win)
        h2win[:] = jnp.zeros_like(h2win)

    # the panel loop writes only interior lanes [XPAD, wps-XPAD); the lane
    # margins of the carry-out buffers must be zero (next step's conv taps at
    # the first/last image column read one lane into them)
    h1out[:, :, :XPAD] = jnp.zeros_like(h1out[:, :, :XPAD])
    h1out[:, :, wps - XPAD :] = jnp.zeros_like(h1out[:, :, wps - XPAD :])
    h2out[:, :, :XPAD] = jnp.zeros_like(h2out[:, :, :XPAD])
    h2out[:, :, wps - XPAD :] = jnp.zeros_like(h2out[:, :, wps - XPAD :])

    # All compute runs inside a fori_loop over column panels: each iteration
    # sees a [.., R, PW] window (interior ptw lanes + XPAD halo per side), so
    # the Mosaic compiler's unrolled vector-op count is bounded by PW — not
    # by the image width (the monolithic full-width body was compile-
    # intractable at production widths, BASELINE.md round-4). The chain's
    # in-step lane receptive field (~12) is far inside the halo, and rolls
    # wrap only within the window, corrupting lanes the interior never reads.
    #
    # All in-kernel vector values are f32 (Mosaic rotate is 32-bit only;
    # sigmoid/tanh lowering likewise rejects bf16); ``dt`` appears only in the
    # DMA scratch buffers and as the per-piece cast at MXU contraction inputs
    # (see _conv3), so bf16 configs keep bf16 matmul throughput and halve the
    # carry/volume HBM traffic.
    cp_v.wait()

    @pl.when(d > 0)
    def _():
        cp_h1.wait()
        cp_h2.wait()

    def panel(j, carry):
        ws = pl.multiple_of(j * ptw, 128)  # window start lane
        io = pl.multiple_of(ws + XPAD, 128)  # interior start lane

        # in-image masks (global image row = row0 - HALO + r, col =
        # ws + lane - XPAD). Half-res level: rows compact (half-row Y =
        # rowh0 - HALO/2 + q), lanes sparse — valid iff the lane's image col
        # is even and in [0, w). ws is a multiple of 128, so window-lane
        # parity == global-lane parity.
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, PW), 0) + (row0 - HALO)
        cc = jax.lax.broadcasted_iota(jnp.int32, (R, PW), 1) + (ws - XPAD)
        mask = ((rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)).astype(jnp.float32)[None]
        rrh = jax.lax.broadcasted_iota(jnp.int32, (Rh, PW), 0) + (rowh0 - HALO // 2)
        cch = jax.lax.broadcasted_iota(jnp.int32, (Rh, PW), 1) + (ws - XPAD)
        maskh = (
            (rrh >= 0) & (rrh < (h + 1) // 2)
            & (cch >= 0) & (cch < w) & (cch % 2 == 0)
        ).astype(jnp.float32)[None]

        x = vwin[:, :, pl.ds(ws, PW)].astype(jnp.float32) * mask
        # mask every conv input: even bias-free outputs are nonzero in the
        # ring just outside the image (taps reach inside), where XLA reads
        # zero padding
        c1 = jnp.maximum(_conv3(x, wc1, dt), 0.0).reshape(bch, R, PW)
        c1 = c1 * mask

        h1 = h1win[:, :, pl.ds(ws, PW)].astype(jnp.float32)
        g = _conv3(jnp.concatenate([c1, h1], axis=0), wg1, dt) + bg1[:]
        r = jax.nn.sigmoid(g[:bch]).reshape(bch, R, PW)
        u = jax.nn.sigmoid(g[bch:]).reshape(bch, R, PW)
        cand = _conv3(jnp.concatenate([c1, r * h1], axis=0), wn1, dt)
        cand = jnp.tanh(cand + bn1[:]).reshape(bch, R, PW)
        h1n = (u * h1 + (1.0 - u) * cand) * mask  # mask: biased, leaks otherwise
        h1out[:, :, pl.ds(io, ptw)] = h1n[
            :, HALO : HALO + th, XPAD : XPAD + ptw
        ].astype(dt)

        # stride-2 down conv at full res, then decimate rows (sublane
        # reshape); lanes stay sparse — valid half-res samples at even lanes.
        # Row alignment: full row r <-> image y = row0+r-HALO, half q <->
        # y/2 = row0/2+q-HALO/2, so even window rows 0..2Rh map exactly onto
        # the half-res window.
        c2f = jnp.maximum(_conv3(h1n, wc2, dt), 0.0).reshape(2 * bch, R, PW)
        c2 = _rows_dec2(c2f)[:, :Rh, :] * maskh  # [2b, Rh, PW] lanes-sparse

        h2 = h2win[:, :, pl.ds(ws, PW)].astype(jnp.float32)
        g2 = _conv3(jnp.concatenate([c2, h2], axis=0), wg2, dt, lane_step=2) + bg2[:]
        r2g = jax.nn.sigmoid(g2[: 2 * bch]).reshape(2 * bch, Rh, PW)
        u2g = jax.nn.sigmoid(g2[2 * bch :]).reshape(2 * bch, Rh, PW)
        cand2 = _conv3(jnp.concatenate([c2, r2g * h2], axis=0), wn2, dt, lane_step=2)
        cand2 = jnp.tanh(cand2 + bn2[:]).reshape(2 * bch, Rh, PW)
        h2n = (u2g * h2 + (1.0 - u2g) * cand2) * maskh  # odd lanes exactly 0
        h2out[:, :, pl.ds(io, ptw)] = h2n[
            :, HALO // 2 : HALO // 2 + th // 2, XPAD : XPAD + ptw
        ].astype(dt)

        # up path: u1 = relu(deconv(r2) + r1); deconv output rows 2q+a align
        # with the full-res window exactly (half window row 0 <-> full window
        # row 0)
        u1 = _deconv_half_to_full(h2n, wu1, bu1[:], dt)  # [b, 2*Rh, PW] dense
        u1 = jnp.maximum(u1[:, :R, :] + h1n, 0.0) * mask

        if up:
            c0, c1v = _deconv_up_phases(u1, wh, bh[:], dt)  # each [1, 2R, PW]
            cost_ref[0, 0, 0, :, pl.ds(io, ptw)] = c0[
                0, 2 * HALO : 2 * HALO + 2 * th, XPAD : XPAD + ptw
            ].astype(dt)
            cost_ref[0, 0, 1, :, pl.ds(io, ptw)] = c1v[
                0, 2 * HALO : 2 * HALO + 2 * th, XPAD : XPAD + ptw
            ].astype(dt)
        else:
            out = (_conv3(u1, wh, dt) + bh[:]).reshape(1, R, PW)
            cost_ref[0, 0, :, pl.ds(io, ptw)] = out[
                0, HALO : HALO + th, XPAD : XPAD + ptw
            ].astype(dt)
        return carry

    jax.lax.fori_loop(0, npan, panel, 0)

    wr_h1 = pltpu.make_async_copy(
        h1out, h1_ref.at[pw, b_i, :, pl.ds(HALO + row0, th), :], sems.at[3]
    )
    wr_h1.start()
    wr_h2 = pltpu.make_async_copy(
        h2out, h2_ref.at[pw, b_i, :, pl.ds(HALO // 2 + rowh0, th // 2), :], sems.at[4]
    )
    wr_h2.start()
    wr_h1.wait()
    wr_h2.wait()


@functools.partial(
    jax.jit,
    static_argnames=("cin", "base", "up", "h", "w", "tile_rows", "interpret"),
)
def ada_red_scan(
    packed: dict,
    vol_sp: jnp.ndarray,  # [D, B, Cin, Hps, Wps] padded channel-major
    cin: int,
    base: int,
    up: bool,
    h: int,
    w: int,
    tile_rows: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the AdaRedCell recurrence over all D slices -> regularized cost
    volume [D, B, oh, ow] (oh = 2h when ``up``), model dtype."""
    D, B = vol_sp.shape[:2]
    dt = vol_sp.dtype
    th = tile_rows or pick_tile_rows(w)
    assert th >= HALO and th % 8 == 0, th  # margin writes source from h1out
    nty, hps, wps = spatial_dims(h, w, th)
    assert vol_sp.shape[2:] == (cin, hps, wps), (vol_sp.shape, (cin, hps, wps))
    ptw = _panel_width(w)
    npan = -(-w // ptw)
    R = th + 2 * HALO
    Rh = th // 2 + HALO
    hpsh = HALO // 2 + nty * (th // 2) + HALO // 2
    bch = base

    if up:
        # lane-phase-split: out[.., r, 2j+c] lives at [.., c, r, j]
        out_shape_cost = (D, B, 2, 2 * nty * th, wps)
        cost_block = (1, 1, 2, 2 * th, wps)
        cost_idx = lambda b, d, ty: (d, b, 0, ty, 0)
    else:
        out_shape_cost = (D, B, nty * th, wps)
        cost_block = (1, 1, th, wps)
        cost_idx = lambda b, d, ty: (d, b, ty, 0)

    worder = ("wc1", "wg1", "bg1", "wn1", "bn1", "wc2", "wg2", "bg2",
              "wn2", "bn2", "wu1", "bu1", "wh", "bh")
    wvals = [packed[k].astype(jnp.float32) for k in worder]

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    def _const_spec(v):
        n = v.ndim
        return pl.BlockSpec(
            v.shape, lambda *_: (0,) * n, memory_space=pltpu.MemorySpace.VMEM
        )

    wspecs = [_const_spec(v) for v in wvals]

    cost, _, _ = pl.pallas_call(
        functools.partial(
            _red_scan_kernel, cin=cin, base=bch, up=up, th=th, h=h, w=w,
            hps=hps, wps=wps, ptw=ptw, npan=npan, dt=dt,
        ),
        grid=(B, D, nty),
        in_specs=[hbm] + wspecs,
        out_specs=[
            pl.BlockSpec(cost_block, cost_idx),
            hbm,
            hbm,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape_cost, dt),
            jax.ShapeDtypeStruct((2, B, bch, hps, wps), dt),
            jax.ShapeDtypeStruct((2, B, 2 * bch, hpsh, wps), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((cin, R, wps), dt),
            pltpu.VMEM((bch, R, wps), dt),
            pltpu.VMEM((2 * bch, Rh, wps), dt),
            pltpu.VMEM((bch, th, wps), dt),
            pltpu.VMEM((2 * bch, th // 2, wps), dt),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * D * nty * 2 * (R * wps) * (
                3 * cin * bch + 3 * 2 * bch * 3 * bch + 2 * bch * 3 * bch
                + (3 * 4 * bch * 4 * bch + 3 * 4 * bch * 2 * bch) // 2
                + 2 * bch * bch + 9 * bch * (4 if up else 1)
            ),
            bytes_accessed=B * D * nty * (cin + 3 * bch) * R * wps * dt.itemsize,
            transcendentals=B * D * nty * R * wps * 3 * bch,
        ),
        interpret=interpret,
    )(vol_sp, *wvals)

    if up:
        # [D, B, 2, 2R, W] -> [D, B, 2R, 2W]: out[.., r, 2j+c] = cost[.., c, r, j]
        full = jnp.moveaxis(cost, 2, -1).reshape(D, B, 2 * nty * th, 2 * wps)
        return full[:, :, : 2 * h, 2 * XPAD : 2 * XPAD + 2 * w]
    return cost[:, :, :h, XPAD : XPAD + w]
