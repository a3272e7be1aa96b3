"""Ada-MVS: adaptive visibility-weighted cascade plane-sweep stereo.

TPU-first re-design of the reference model family (models/adamvs.py):

- ONE forward implementation serves training, evaluation, and full-resolution
  streaming inference. The reference maintains two hand-written forks
  (``AdaMVSNet`` building full cost volumes, adamvs.py:241-396, and
  ``Infer_AdaMVSNet`` streaming one depth slice at a time with online-softmax
  accumulation, adamvs.py:426-620). Here the fused-volume regularization is a
  single ``nn.scan`` over depth hypotheses whose carry holds the ConvGRU states
  and a *stabilized* online softmax (running max — mathematically identical to
  the full softmax, unlike the reference's unguarded ``exp``,
  adamvs.py:516).
- Cost volumes are never materialized: each scan step warps all source views at
  one hypothesis slice, fuses them with the per-view visibility weights, and
  feeds one GRU step. XLA fuses warp+product+weighting per step; memory is
  O(H·W) not O(D·H·W).
- Stage-1 per-view matching (the visibility estimator): per source view, a
  correlation volume mean_C(ref ⊙ warp) over D0 fronto-parallel planes is
  regularized by a 2D U-Net with depth-as-channels (adamvs.py:268-288), giving
  per-view confidence (max softmax prob) and per-view depth. Stage >= 2 reuses
  these confidences, bilinearly resized, as fixed fusion weights
  (adamvs.py:292-302) — that IS the published design.
- Fusion normalization uses the Infer-form ``Σ(w·v) / (1e-5 + Σw)``
  (adamvs.py:497-512); the train-form's ``(1e-5 + Σ(w·v)) / Σw``
  (adamvs.py:262-290) differs only by the epsilon placement.

Up-sampling chain: stage cells with ``up=True`` emit costs at 2x resolution
(reference CostRegNetRED up path), so stage-1 depth lands at H/2, stage-2 at H,
and stage-3 (up=False) stays at H — hypothesis windows for stage k+1 are built
directly at stage k's output resolution (adamvs.py:368-375).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.costreg import AdaRedCell, CostRegNet2D
from ..nn.featurenet import AdaFeatureNet
from ..ops.regression import (
    online_softmax_finalize,
    online_softmax_init,
    online_softmax_update,
    resize_bilinear,
)
from ..ops.sampling import uniform_depth_samples, window_min_and_interval
from ..ops.red_scan import (
    ada_red_scan,
    pack_red_params,
    pick_tile_rows,
    refold_spatial,
)
from ..ops.sweep_fuse import (
    corr_sweep_volume,
    corr_sweep_volume_t,
    fold_grid,
    fused_sweep_volume,
    fused_sweep_volume_t,
    merge_sources,
    unfold_tiles,
)
from ..ops.warp import plane_sweep_warp
from ..ops.warp_banded import plane_sweep_warp_banded
from ..ops.warp_pallas import plane_sweep_warp_pallas
from ..ops.warp_pallas2 import merge_source, plane_sweep_warp_pallas2

# reference up-flags by stage index (adamvs.py:340,562-565): stages 1 and 2
# upsample their regularized cost 2x, stage 3 does not.
_UP_BY_STAGE = (True, True, False)


def pack_reg_params(model, variables) -> tuple:
    """Pack every stage's recurrent-regularizer flax params into the
    matmul-ready matrices the fused Pallas scan kernel (ops/red_scan.py)
    contracts against. Computed once per checkpoint, passed into
    ``AdaMVS.__call__(packed_reg=...)`` — the packed tree is a pytree of small
    arrays, so it jits as ordinary inputs."""
    return tuple(
        pack_red_params(
            variables["params"][f"reg_fuse{i + 1}"]["cell"], _UP_BY_STAGE[i]
        )
        for i in range(len(model.ndepths))
    )


def model_pack_reg(model, variables):
    """Family dispatcher used by PredictEngine/bench: the per-stage packed
    regularizer tree for whatever ``reg_impl`` the model is configured with
    (AdaMVS 'pallas' -> matmul matrices; MSREDNet 'precomp' -> raw cell
    subtrees)."""
    impl = getattr(model, "reg_impl", "scan")
    if impl == "scan":
        return None
    if impl == "pallas":
        return pack_reg_params(model, variables)
    if impl == "precomp":
        n = len(model.ndepths)
        prefix = "reg_fuse" if type(model).__name__ == "AdaMVS" else "reg"
        return tuple(
            variables["params"][f"{prefix}{i + 1}"]["cell"] for i in range(n)
        )
    raise ValueError(f"unknown reg_impl {impl!r}")


def parse_depth_values(depth_values: jnp.ndarray, num_depth: int | None):
    """(dmin [B], dmax [B], interval [B]) from the two input conventions:
    train [B,3]=[min,max,interval] (adamvs.py:344-347) or predict
    [B,2]=[min,max] with interval=(max-min)/num_depth (adamvs.py:569-571)."""
    if depth_values.shape[-1] == 3:
        return depth_values[:, 0], depth_values[:, 1], depth_values[:, 2]
    if num_depth is None:
        raise ValueError("depth_values [B,2] requires num_depth")
    dmin, dmax = depth_values[:, 0], depth_values[:, 1]
    return dmin, dmax, (dmax - dmin) / num_depth


def get_warp_fn(impl: str, bands: tuple[int, int] = (32, 256)):
    """Select the plane-sweep warp implementation: 'gather' (XLA gather —
    exact everywhere, slow on TPU), 'banded' (MXU block-banded one-hot,
    pure XLA), or 'pallas' (hand-scheduled kernel; see ops/warp_pallas.py)."""
    if impl == "gather":
        return plane_sweep_warp
    if impl == "banded":
        rb, cb = bands

        def fn(src_feat, src_proj, ref_proj, depth, grid_hw=None):
            return plane_sweep_warp_banded(
                src_feat, src_proj, ref_proj, depth, grid_hw=grid_hw,
                row_band=rb, col_band=cb,
            )

        return fn
    if impl == "pallas":
        rb, cb = bands

        def fn(src_feat, src_proj, ref_proj, depth, grid_hw=None):
            return plane_sweep_warp_pallas(
                src_feat, src_proj, ref_proj, depth, grid_hw=grid_hw,
                row_band=rb, col_band=cb,
            )

        return fn
    if impl in ("pallas2", "pallas2bf16"):
        rb, cb = _pallas2_bands(bands)
        mm_dtype = jnp.bfloat16 if impl == "pallas2bf16" else None

        def fn(src_feat, src_proj, ref_proj, depth, grid_hw=None):
            return plane_sweep_warp_pallas2(
                src_feat, src_proj, ref_proj, depth, grid_hw=grid_hw,
                row_band=rb, col_band=cb, mm_dtype=mm_dtype,
            )

        return fn
    raise ValueError(f"unknown warp_impl {impl!r}")


def _pallas2_bands(bands: tuple[int, int]) -> tuple[int, int]:
    """Merged-lane kernel band knobs are spans (padded to pow2/128-lane
    inside the kernel), not v1-style padded slice sizes — scale the shared
    config knob 2:1 so a user-enlarged band (wide-baseline geometry) enlarges
    the kernel band proportionally instead of being silently clamped."""
    rb, cb = bands
    return max(16, rb // 2), max(112, cb * 112 // 256)  # (32,256) -> (16,112)


def prepare_warp_sources(impl: str, bands, src_feats, dtype=None):
    """Hoist the pallas2 merged-lane source transform out of the depth scan:
    returns a tuple of ``MergedSource`` (one per view) for the pallas2 impls,
    or ``src_feats`` unchanged. ~21% of forward device time at bench shapes
    was this transform re-executed every scan step (tools/trace_attrib.py)."""
    if impl not in ("pallas2", "pallas2bf16"):
        return src_feats
    rb, cb = _pallas2_bands(bands)
    mm_dtype = jnp.bfloat16 if impl == "pallas2bf16" else None
    n = len(src_feats) if isinstance(src_feats, (tuple, list)) else src_feats.shape[0]
    return tuple(
        merge_source(src_feats[v], row_band=rb, col_band=cb, mm_dtype=mm_dtype)
        for v in range(n)
    )


def _num_src(src_feats) -> int:
    return len(src_feats) if isinstance(src_feats, (tuple, list)) else src_feats.shape[0]


def correlation_volume(
    ref_feat: jnp.ndarray,  # [B,h,w,C]
    src_feat: jnp.ndarray,  # [B,h,w,C]
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    hyp: jnp.ndarray,  # [B,D]
    block: int = 16,
    warp_fn=plane_sweep_warp,
) -> jnp.ndarray:
    """Channel-mean correlation volume [B,h,w,D], built in depth blocks so the
    [B,D,h,w,C] warp intermediate never materializes at full D."""
    B, h, w, _ = ref_feat.shape
    D = hyp.shape[1]
    if D % block != 0:
        block = D
    nb = D // block
    hyp_blocks = hyp.reshape(B, nb, block).transpose(1, 0, 2)  # [nb,B,block]

    def one_block(hb):
        warped = warp_fn(
            src_feat, src_proj, ref_proj, hb, grid_hw=(h, w)
        )  # [B,block,h,w,C]
        return jnp.mean(ref_feat[:, None] * warped, axis=-1)  # [B,block,h,w]

    out = jax.lax.map(one_block, hyp_blocks)  # [nb,B,block,h,w]
    return out.transpose(1, 0, 2, 3, 4).reshape(B, D, h, w).transpose(0, 2, 3, 1)


def ada_precomp_depth(cell_params: dict, fused_all: jnp.ndarray, base: int,
                      up: bool, lo_acc: jnp.ndarray, step_acc: jnp.ndarray,
                      dtype=None, chunk: int = 8):
    """AdaRedCell recurrence (reference CostRegNetRED, adamvs.py:157-195)
    restructured for serial-scan economics — the XLA sibling of the
    ops/red_scan.py Pallas kernel (whose Mosaic compile is intractable at
    production widths):

    - the entry conv (cin -> b) and the x-halves of GRU1's gates/candidate
      convs are batched over the whole depth axis outside the scan;
    - the scan carries (h1, h2) and runs only the h-side GRU1 convs, the
      stride-2 down conv (recurrent input r1), and GRU2;
    - the up-deconv + skip + head run batched over D after the scan, then a
      full softmax over the materialized cost volume (== online softmax).

    ``cell_params``: the flax AdaRedCell subtree (same checkpoint as the scan
    path). ``fused_all`` [D,B,h,w,C]; ``lo_acc``/``step_acc`` are the
    hypothesis maps at OUTPUT resolution (2h x 2w when ``up``). Returns
    (depth [B,oh,ow], confidence [B,oh,ow]).
    Inference-only: parameters arrive as data, so gradients would not reach
    the train state (training keeps the scan path).

    The depth axis runs in ``chunk``-sized blocks under an outer ``lax.scan``
    carrying (h1, h2) AND the online-softmax accumulator — neither the
    batched intermediates nor a [D,B,oh,ow] cost volume ever materialize
    (both OOM'd HBM at bench shapes; the cost volume additionally picks a
    D-minor layout that 16x lane-pads)."""
    from ..nn.blocks import ConvReLU
    from ..nn.fastconv import FastConv, FastConvTranspose

    D, B, h, w, C = fused_all.shape
    b = base
    dt = dtype
    K = chunk if D % chunk == 0 else D

    g1 = cell_params["ConvGRUCell_0"]
    kg, bg = g1["FastConv_0"]["kernel"], g1["FastConv_0"]["bias"]
    kc, bc = g1["FastConv_1"]["kernel"], g1["FastConv_1"]["bias"]
    khg1, khc1 = kg[:, :, b:], kc[:, :, b:]
    conv2 = ConvReLU(2 * b, 3, 2, dtype=dt)
    p_conv2 = {"params": cell_params["ConvReLU_1"]}
    gru2 = cell_params["ConvGRUCell_1"]

    def gru_steps(carry, g1x_d, c1x_d):
        h1, h2 = carry
        gates = g1x_d + FastConv(2 * b, (3, 3), use_bias=False, dtype=dt).apply(
            {"params": {"kernel": khg1}}, h1)
        r = nn.sigmoid(gates[..., :b])
        u = nn.sigmoid(gates[..., b:])
        cand = nn.tanh(c1x_d + FastConv(b, (3, 3), use_bias=False, dtype=dt).apply(
            {"params": {"kernel": khc1}}, r * h1))
        h1 = u * h1 + (1 - u) * cand  # == r1 (ConvGRUCell output is the state)
        c2 = conv2.apply(p_conv2, h1)
        gates2 = FastConv(4 * b, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": gru2["FastConv_0"]}, jnp.concatenate([c2, h2], axis=-1))
        r2 = nn.sigmoid(gates2[..., : 2 * b])
        u2 = nn.sigmoid(gates2[..., 2 * b :])
        cand2 = nn.tanh(FastConv(2 * b, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": gru2["FastConv_1"]},
            jnp.concatenate([c2, r2 * h2], axis=-1)))
        h2 = u2 * h2 + (1 - u2) * cand2
        return (h1, h2)

    def chunk_body(carry, fused_chunk):  # [K*B, h, w, C]
        # inner K steps UNROLLED: a lax.scan here would stack [K,B,h,w,C]
        # intermediates whose two small leading/trailing dims force 16x
        # lane-padded layouts at full res (9.7 GB HBM temps at bench shapes)
        gru_carry, acc, d0 = carry
        c1 = ConvReLU(b, 3, 1, dtype=dt).apply(
            {"params": cell_params["ConvReLU_0"]}, fused_chunk)
        g1x = FastConv(2 * b, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": {"kernel": kg[:, :, :b], "bias": bg}}, c1)
        c1x = FastConv(b, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": {"kernel": kc[:, :, :b], "bias": bc}}, c1)
        r1s, r2s = [], []
        for k in range(K):
            gru_carry = gru_steps(gru_carry, g1x[k * B : (k + 1) * B],
                                  c1x[k * B : (k + 1) * B])
            r1s.append(gru_carry[0])
            r2s.append(gru_carry[1])
        r1 = jnp.concatenate(r1s, axis=0)  # [K*B, h, w, b]
        r2 = jnp.concatenate(r2s, axis=0)
        u1 = FastConvTranspose(b, (3, 3), strides=(2, 2), use_bias=True,
                               dtype=dt, use_stock=True).apply(
            {"params": cell_params["FastConvTranspose_0"]}, r2)
        u1 = nn.relu(u1 + r1)
        if up:
            cost = FastConvTranspose(1, (3, 3), strides=(2, 2), use_bias=True,
                                     dtype=dt, use_stock=True).apply(
                {"params": cell_params["FastConvTranspose_1"]}, u1)
        else:
            cost = FastConv(1, (3, 3), use_bias=True, dtype=dt).apply(
                {"params": cell_params["FastConv_0"]}, u1)
        cost = cost[..., 0]  # [K*B, oh, ow]
        for k in range(K):
            acc = online_softmax_update(
                acc, cost[k * B : (k + 1) * B],
                lo_acc + (d0 + k) * step_acc,
            )
        return (gru_carry, acc, d0 + K), jnp.float32(0.0)

    oh, ow = ((2 * h, 2 * w) if up else (h, w))
    carry0 = (
        (
            jnp.zeros((B, h, w, b), dt or jnp.float32),
            jnp.zeros((B, -(-h // 2), -(-w // 2), 2 * b), dt or jnp.float32),
        ),
        online_softmax_init((B, oh, ow)),
        jnp.float32(0.0),
    )
    # chunks as [D//K, K*B, h, w, C]: the outer scan slices along a LARGE
    # leading dim only (layout-neutral)
    (_, acc, _), _ = jax.lax.scan(
        chunk_body, carry0,
        fused_all.reshape((D // K, K * B) + fused_all.shape[2:]),
    )
    return online_softmax_finalize(acc)


class _AdaFuseStreamCell(nn.Module):
    """One depth-hypothesis step: warp all views, visibility-weighted fusion,
    one recurrent-regularizer step, online-softmax accumulation."""

    base: int
    up: bool
    warp_impl: str = "gather"
    warp_bands: tuple[int, int] = (32, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, d, ref_feat, src_feats, src_projs, ref_proj, weights, lo, step):
        red_carry, acc = carry
        hyp = lo + d * step  # [B,h,w]
        depth_arg = hyp[:, None]  # [B,1,h,w]

        warp_fn = get_warp_fn(self.warp_impl, self.warp_bands)
        num_src = _num_src(src_feats)
        wsum = jnp.float32(1e-5)
        vsum = jnp.float32(0.0)
        for v in range(num_src):
            warped = warp_fn(src_feats[v], src_projs[v], ref_proj, depth_arg)[:, 0]
            w_v = weights[..., v : v + 1]  # [B,h,w,1]
            vsum = vsum + (ref_feat * warped) * w_v
            wsum = wsum + w_v
        fused = vsum / wsum  # [B,h,w,C]

        red_carry, cost = AdaRedCell(self.base, self.up, dtype=self.dtype, name="cell")(
            red_carry, fused
        )
        cost = cost[..., 0]  # [B,h',w']
        if self.up:
            hyp_acc = resize_bilinear(hyp, hyp.shape[1] * 2, hyp.shape[2] * 2)
        else:
            hyp_acc = hyp
        acc = online_softmax_update(acc, cost, hyp_acc)
        return (red_carry, acc), jnp.float32(0.0)


def _depth_sharded_fuse(
    mesh, axis, warp_fn, ref_feat, src_feats, src_projs, ref_proj,
    weights, lo, step, D, up,
):
    """Phase 1 of the depth-sharded sweep: every depth hypothesis' warp +
    visibility-weighted fusion computed in parallel, D-blocks sharded over
    ``axis``. Returns ([D,B,h,w,C] fused slices, [D,B,oh,ow] hypothesis maps
    at accumulator resolution), both depth-sharded."""
    from jax.sharding import PartitionSpec as P

    k = mesh.shape[axis]
    if D % k != 0:
        raise ValueError(f"ndepths entry {D} must divide the '{axis}' mesh axis ({k})")
    d_idx = jnp.arange(D, dtype=jnp.float32)

    def fuse_block(d_blk, ref_feat, src_feats, src_projs, ref_proj, weights, lo, step):
        hyp = lo[:, None] + d_blk[None, :, None, None] * step[:, None]  # [B,Dk,h,w]
        wsum = jnp.float32(1e-5)
        vsum = jnp.float32(0.0)
        for v in range(_num_src(src_feats)):
            warped = warp_fn(src_feats[v], src_projs[v], ref_proj, hyp)  # [B,Dk,h,w,C]
            w_v = weights[..., v : v + 1][:, None]  # [B,1,h,w,1]
            vsum = vsum + (ref_feat[:, None] * warped) * w_v
            wsum = wsum + w_v
        fused = vsum / wsum
        if up:
            hyp_acc = resize_bilinear(hyp, hyp.shape[2] * 2, hyp.shape[3] * 2)
        else:
            hyp_acc = hyp
        return jnp.moveaxis(fused, 1, 0), jnp.moveaxis(hyp_acc, 1, 0)

    fn = jax.shard_map(
        fuse_block,
        mesh=mesh,
        in_specs=(P(axis),) + (P(),) * 7,
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(d_idx, ref_feat, src_feats, src_projs, ref_proj, weights, lo, step)


class _AdaRegStreamCell(nn.Module):
    """Scan cell over PRECOMPUTED fused slices — the depth-sharded sweep path.
    Parameter tree is identical to ``_AdaFuseStreamCell`` (one ``cell``
    submodule), so the same checkpoint serves both paths."""

    base: int
    up: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, fused, hyp_acc):
        red_carry, acc = carry
        red_carry, cost = AdaRedCell(self.base, self.up, dtype=self.dtype, name="cell")(
            red_carry, fused
        )
        acc = online_softmax_update(acc, cost[..., 0], hyp_acc)
        return (red_carry, acc), jnp.float32(0.0)


class _AdaRegIdxStreamCell(nn.Module):
    """Scan cell over precomputed fused slices with the hypothesis map built
    in-cell from (lo, step, d) — the one-call fused-sweep path
    (ops/sweep_fuse.py). Same parameter tree as ``_AdaFuseStreamCell``.

    ``grid`` non-empty: slices arrive in the kernel-native folded layout
    [B*T, C, P] and are unfolded here, per slice — XLA fuses the scan's
    dynamic-slice with the unfold transpose instead of materializing a
    transposed full volume."""

    base: int
    up: bool
    grid: tuple = ()
    tile: tuple[int, int] = (8, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, fused, d, lo_acc, step_acc):
        """One scan step = a BLOCK of K depth slices: ``fused`` [K,B*T,C,P]
        (or [K,B,h,w,C]), ``d`` [K]. The K recurrent sub-steps run inside one
        while-loop body — the per-iteration costs (dynamic-slice of the
        volume, the unfold relayout, conv-input layout copies at region
        boundaries) amortize over K. The ``cell`` submodule is instantiated
        once and called K times, so the parameter tree is identical to the
        per-slice cells'.

        ``lo_acc``/``step_acc`` are pre-resized to the accumulator
        resolution: bilinear resize is linear, so
        resize(lo + d*step) == resize(lo) + d*resize(step) exactly — one
        resize per stage instead of one per depth slice."""
        red_carry, acc = carry
        K = fused.shape[0]
        if self.grid:
            B, nty, ntx, h, w = self.grid
            xs = unfold_tiles(
                fused.reshape((K * B * nty * ntx,) + fused.shape[2:]),
                (K * B, nty, ntx, h, w), *self.tile,
            )  # one relayout for the whole block: [K*B, h, w, C]
            xs = xs.reshape((K, B) + xs.shape[1:])
        else:
            xs = fused
        cell = AdaRedCell(self.base, self.up, dtype=self.dtype, name="cell")
        for k in range(K):
            red_carry, cost = cell(red_carry, xs[k])
            acc = online_softmax_update(acc, cost[..., 0], lo_acc + d[k] * step_acc)
        return (red_carry, acc), jnp.float32(0.0)


class AdaMVS(nn.Module):
    """Cascade orchestrator (reference AdaMVSNet adamvs.py:316-396 and
    Infer_AdaMVSNet adamvs.py:537-620 unified).

    ``depth_mesh``/``depth_axis``: depth-hypothesis-axis sharding — the
    SP-analog of SURVEY.md §2.6. The per-hypothesis warp+visibility-fusion
    (the majority of sweep FLOPs) runs under ``shard_map`` with D-blocks
    sharded over ``depth_axis``; the recurrent regularizer scan then runs
    replicated over the gathered fused volume, and the online-softmax
    accumulation is unchanged (its partial states merge associatively —
    ops/regression.py:online_softmax_merge — but the exact path here keeps
    one scan, so results are IDENTICAL to the unsharded forward; the GRU
    depth recurrence is inherently sequential and is not approximated)."""

    ndepths: tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: tuple[float, ...] = (4.0, 2.0, 1.0)
    base: int = 8
    cr_base: tuple[int, ...] = (8, 8, 8)
    warp_block: int = 16
    warp_impl: str = "gather"
    warp_bands: tuple[int, int] = (32, 256)
    use_remat: bool = True
    dtype: Any = None
    depth_mesh: Any = None  # jax.sharding.Mesh with ``depth_axis`` in it
    depth_axis: str = "depth"
    # "scan": per-depth warp inside the recurrent scan (exact reference
    # streaming). "fused"/"fusedf32": the whole visibility-weighted volume in
    # one Pallas call per stage (ops/sweep_fuse.py; bands in bf16 or f32),
    # then the recurrent regularizer scans the precomputed slices.
    sweep_impl: str = "scan"
    fuse_bands: tuple[int, int] = (12, 128)
    fuse_d_chunk: int = 16
    # "scan": recurrent regularizer as an XLA nn.scan over depth slices.
    # "pallas": the whole depth recurrence in one Pallas kernel per stage
    # (ops/red_scan.py) — inference-only (no VJP), requires sweep_impl
    # "fused"/"fusedf32" and ``packed_reg`` passed to __call__.
    reg_impl: str = "scan"
    # depth slices per regularizer-scan step. Measured on v5e at bench shapes:
    # K=4 is ~1% slower than K=1 (the while-step costs are data-proportional
    # layout copies, not fixed overhead), so default 1; the knob remains for
    # other shapes/generations.
    fuse_scan_block: int = 1

    def feature_module(self) -> nn.Module:
        """Standalone feature net matching the 'feature' submodule — apply it
        with ``variables['params']['feature']`` (+ batch_stats) to precompute
        the pyramid for the tiled predict path."""
        return AdaFeatureNet(self.base, num_stages=len(self.ndepths), dtype=self.dtype, parent=None)

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,  # [B,V,H,W,3]
        proj_matrices: dict[str, jnp.ndarray],  # {"stageK": [B,V,4,4]}
        depth_values: jnp.ndarray,  # [B,3] train or [B,2] predict
        train: bool = False,
        num_depth: int | None = None,
        features: dict[str, jnp.ndarray] | None = None,
        packed_reg: tuple | None = None,
    ) -> dict:
        """``features`` (optional): precomputed pyramid — either
        {"stageK": [B,V,h,w,C]} or {"stageK": (ref [B,h,w,C], srcs [V-1,B,H,W,C])}.
        The tuple form lets a row-band reference sample full source frames
        (tile-sharded predict, predict/tiled.py); ``imgs`` may be None then."""
        dmin, dmax, interval = parse_depth_values(depth_values, num_depth)

        if features is None:
            B, V = imgs.shape[:2]
            flat = imgs.reshape((B * V,) + imgs.shape[2:])
            feats = AdaFeatureNet(
                self.base, num_stages=len(self.ndepths), dtype=self.dtype, name="feature"
            )(flat, train)
            feats = {k: v.reshape((B, V) + v.shape[1:]) for k, v in feats.items()}
        else:
            feats = features
            first = feats["stage1"]
            if isinstance(first, tuple):
                B, V = first[0].shape[0], first[1].shape[0] + 1
            else:
                B, V = first.shape[:2]

        cell_cls = nn.remat(_AdaFuseStreamCell) if self.use_remat else _AdaFuseStreamCell
        scan_cell = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 7,
            out_axes=0,
        )
        reg_cls = nn.remat(_AdaRegStreamCell) if self.use_remat else _AdaRegStreamCell
        scan_reg = nn.scan(
            reg_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, 0),
            out_axes=0,
        )
        idx_cls = nn.remat(_AdaRegIdxStreamCell) if self.use_remat else _AdaRegIdxStreamCell
        scan_idx = nn.scan(
            idx_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, 0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        # fused sweep: inference uses the kernel-folded layout; training keeps
        # the Pallas forward and backpropagates through the gather-recompute
        # custom VJP (ops/sweep_fuse.py fused_sweep_volume_t / corr_..._t)
        fused_cfg = (
            self.sweep_impl in ("fused", "fusedf32") and self.depth_mesh is None
        )
        use_fused = fused_cfg and not train
        use_fused_t = fused_cfg and train
        fuse_mm = jnp.float32 if self.sweep_impl == "fusedf32" else jnp.bfloat16
        # Pallas regularizer scan: inference-only, needs the packed param
        # matrices (absent at init, so init always creates the flax cell
        # params through the scan path — same checkpoint serves both).
        use_pallas_reg = (
            use_fused and self.reg_impl == "pallas" and packed_reg is not None
        )
        use_precomp = (
            use_fused and self.reg_impl == "precomp" and packed_reg is not None
        )
        # A model configured for a fused regularizer must not silently
        # degrade to the scan path at inference (ADVICE r3): fail loudly on
        # wiring mistakes. Init and training legitimately take the scan path.
        if (
            self.reg_impl in ("pallas", "precomp")
            and not train
            and not self.is_initializing()
            and not (use_pallas_reg or use_precomp)
        ):
            raise ValueError(
                f"reg_impl={self.reg_impl!r} requires sweep_impl='fused'/"
                "'fusedf32', no depth_mesh, and packed_reg="
                "model_pack_reg(model, variables) passed to __call__ "
                f"(got sweep_impl={self.sweep_impl!r}, "
                f"depth_mesh={'set' if self.depth_mesh is not None else 'None'}, "
                f"packed_reg={'set' if packed_reg is not None else 'None'})"
            )

        outputs: dict[str, Any] = {}
        prev_depth = None
        pair_conf = None  # [B,h1,w1,V-1]
        for si in range(len(self.ndepths)):
            key = f"stage{si + 1}"
            D = self.ndepths[si]
            feat = feats[key]
            projs = proj_matrices[key]
            if isinstance(feat, tuple):
                ref_feat, src_feats = feat
            else:
                ref_feat = feat[:, 0]
                src_feats = jnp.moveaxis(feat[:, 1:], 1, 0)  # [V-1,B,h,w,C]
            ref_proj, src_projs = projs[:, 0], projs[:, 1:]
            src_projs = jnp.moveaxis(src_projs, 1, 0)  # [V-1,B,4,4]
            h, w = ref_feat.shape[1:3]
            # pallas2: hoist the merged-lane source transform out of the scan
            any_fused = use_fused or use_fused_t
            src_feats_w = src_feats if any_fused else prepare_warp_sources(
                self.warp_impl, self.warp_bands, src_feats, self.dtype
            )
            srcs_m = src_arr = None
            if any_fused:
                src_arr = (
                    src_feats
                    if isinstance(src_feats, jnp.ndarray)
                    else jnp.stack(list(src_feats))
                )
            if use_fused:
                srcs_m = merge_sources(
                    src_arr, row_band=self.fuse_bands[0],
                    col_band=self.fuse_bands[1], mm_dtype=fuse_mm,
                )

            pair_results: tuple = ()
            if si == 0:
                # stage-1 per-view matching -> visibility weights
                lo = jnp.broadcast_to(dmin[:, None, None], (B, h, w))
                step = jnp.broadcast_to(
                    ((dmax - dmin) / (D - 1))[:, None, None], (B, h, w)
                )
                hyp0 = uniform_depth_samples(jnp.stack([dmin, dmax], axis=1), D)  # [B,D]
                reg2d = CostRegNet2D(D, dtype=self.dtype, name="reg2d")
                if use_fused:
                    with jax.named_scope("stage1_pairmatch_corr"):
                        corr_all = corr_sweep_volume(
                            ref_feat, srcs_m, src_projs, ref_proj, lo, step,
                            num_depth=D, d_chunk=self.fuse_d_chunk,
                        )  # [V-1,B,h,w,D]
                elif use_fused_t:
                    with jax.named_scope("stage1_pairmatch_corr"):
                        corr_all = corr_sweep_volume_t(
                            ref_feat, src_arr, src_projs, ref_proj, lo, step,
                            D, self.fuse_d_chunk,
                            self.fuse_bands[0], self.fuse_bands[1], fuse_mm,
                        )
                else:
                    warp_fn = get_warp_fn(self.warp_impl, self.warp_bands)
                confs, pds = [], []
                for v in range(V - 1):
                    with jax.named_scope(f"stage1_pairmatch_v{v}"):
                        if any_fused:
                            corr = corr_all[v]
                        else:
                            corr = correlation_volume(
                                ref_feat, src_feats_w[v], src_projs[v], ref_proj,
                                hyp0, self.warp_block, warp_fn,
                            )
                        prob = jax.nn.softmax(reg2d(corr, train), axis=-1)  # [B,h,w,D]
                    confs.append(jnp.max(prob, axis=-1))
                    pds.append(jnp.sum(prob * hyp0[:, None, None, :], axis=-1))
                pair_conf = jnp.stack(confs, axis=-1)  # [B,h,w,V-1]
                pair_results = tuple(pds)
                weights = pair_conf
            else:
                weights = jax.image.resize(
                    pair_conf, (B, h, w, V - 1), method="linear", antialias=False
                )
                step_interval = (self.depth_intervals_ratio[si] * interval)[:, None, None]
                lo, step = window_min_and_interval(prev_depth, D, step_interval)

            up = _UP_BY_STAGE[si]
            out_h, out_w = (2 * h, 2 * w) if up else (h, w)
            # carry dtype must match the cell compute dtype: an f32 carry
            # promotes every step's concat([x, h]) to f32, forcing per-step
            # converts + f32 convs inside the scan (seen as 'data formatting'
            # in traces). The online-softmax accumulator stays f32.
            red_carry = AdaRedCell(self.cr_base[si], up).init_carry(
                B, h, w, self.dtype or jnp.float32
            )
            acc = online_softmax_init((B, out_h, out_w))
            if any_fused:
                if use_fused:
                    fgrid = fold_grid(B, h, w)
                    with jax.named_scope(f"{key}_sweep_fusedvol"):
                        fused_all = fused_sweep_volume(
                            ref_feat, srcs_m, src_projs, ref_proj, weights, lo, step,
                            num_depth=D, d_chunk=self.fuse_d_chunk,
                            out_dtype=self.dtype or jnp.float32,
                            folded=not use_precomp,
                        )  # [D,B*T,C,P] folded / [D,B,h,w,C] for precomp
                else:
                    fgrid = ()  # unfolded [D,B,h,w,C] for the training path
                    with jax.named_scope(f"{key}_sweep_fusedvol_t"):
                        fused_all = fused_sweep_volume_t(
                            ref_feat, src_arr, weights, src_projs, ref_proj,
                            lo, step, D, self.fuse_d_chunk,
                            self.fuse_bands[0], self.fuse_bands[1], fuse_mm,
                            self.dtype or jnp.float32,
                        )
                if up:
                    lo_acc = resize_bilinear(lo, out_h, out_w)
                    step_acc = resize_bilinear(step, out_h, out_w)
                else:
                    lo_acc, step_acc = lo, step
                cost = None
                if use_pallas_reg:
                    th = pick_tile_rows(w)
                    vol_sp = refold_spatial(fused_all, fgrid, tile_rows=th)
                    with jax.named_scope(f"{key}_sweep_redscan"):
                        cost = ada_red_scan(
                            packed_reg[si], vol_sp, ref_feat.shape[-1],
                            self.cr_base[si], up, h, w, tile_rows=th,
                        )  # [D, B, out_h, out_w]
                if use_precomp:
                    with jax.named_scope(f"{key}_sweep_precompreg"):
                        depth, conf = ada_precomp_depth(
                            packed_reg[si], fused_all, self.cr_base[si], up,
                            lo_acc, step_acc, self.dtype,
                        )
                elif cost is not None:
                    # full-softmax regression over the materialized reg-cost
                    # volume == the scan path's online softmax exactly; XLA
                    # fuses it into two bandwidth-bound passes over ``cost``
                    c32 = cost.astype(jnp.float32)
                    d_idx = jnp.arange(D, dtype=jnp.float32)
                    m = jnp.max(c32, axis=0)
                    e = jnp.exp(c32 - m)
                    s = jnp.sum(e, axis=0) + 1e-10
                    hyp = lo_acc[None] + d_idx[:, None, None, None] * step_acc[None]
                    depth = jnp.sum(e * hyp, axis=0) / s
                    conf = jnp.max(e, axis=0) / s
                else:
                    cell = scan_idx(
                        self.cr_base[si], up, fgrid, dtype=self.dtype,
                        name=f"reg_fuse{si + 1}",
                    )
                    K = self.fuse_scan_block
                    if K <= 0 or D % K:
                        K = 1
                    d_idx = jnp.arange(D, dtype=jnp.float32).reshape(D // K, K)
                    fused_all = fused_all.reshape((D // K, K) + fused_all.shape[1:])
                    with jax.named_scope(f"{key}_sweep_fusedreg"):
                        (red_carry, acc), _ = cell(
                            (red_carry, acc), fused_all, d_idx, lo_acc, step_acc
                        )
                    depth, conf = online_softmax_finalize(acc)
            elif self.depth_mesh is not None:
                fused_all, hyp_acc_all = _depth_sharded_fuse(
                    self.depth_mesh, self.depth_axis,
                    get_warp_fn(self.warp_impl, self.warp_bands),
                    ref_feat, src_feats_w, src_projs, ref_proj, weights, lo, step,
                    D, up,
                )
                cell = scan_reg(
                    self.cr_base[si], up, dtype=self.dtype, name=f"reg_fuse{si + 1}"
                )
                with jax.named_scope(f"{key}_sweep_dsharded"):
                    (red_carry, acc), _ = cell((red_carry, acc), fused_all, hyp_acc_all)
                depth, conf = online_softmax_finalize(acc)
            else:
                cell = scan_cell(
                    self.cr_base[si], up, self.warp_impl, self.warp_bands,
                    dtype=self.dtype, name=f"reg_fuse{si + 1}",
                )
                d_idx = jnp.arange(D, dtype=jnp.float32)
                with jax.named_scope(f"{key}_sweep"):
                    (red_carry, acc), _ = cell(
                        (red_carry, acc), d_idx, ref_feat, src_feats_w, src_projs, ref_proj, weights, lo, step
                    )
                depth, conf = online_softmax_finalize(acc)

            outputs[key] = {
                "depth": depth,
                "photometric_confidence": conf,
                "pair_result": pair_results,
                "pair_confidence": pair_conf,
            }
            prev_depth = depth

        outputs.update(outputs[f"stage{len(self.ndepths)}"])
        return outputs
