"""MS-REDNet: variance-aggregation cascade with a recurrent encoder-decoder.

TPU-first re-design of the reference family (models/msrednet.py): like
``AdaMVS``, ONE streaming implementation (depth-axis ``nn.scan`` with carried
GRU states + stabilized online softmax) replaces the reference's
``CascadeREDNet``/``Infer_CascadeREDNet`` fork (msrednet.py:246-334, 440-525).

Per depth hypothesis: warp every source view, aggregate {ref, warps} by
variance ``E[x²] - E[x]²`` (msrednet.py:214-231), run one step of the 4-level
recurrent encoder-decoder (``RedCell``), accumulate online.

Hypothesis geometry: the reference builds hypothesis volumes at FULL image
resolution and trilinearly resizes them to [D, H/s, W/s] (msrednet.py:309-322).
The depth axis keeps its size under that resize, so it reduces to a bilinear
spatial resize per plane; since the window construction is affine in the plane
index (``hyp_d = lo + d·step``), resizing commutes with it exactly — we resize
the window maps (lo, step), not a [B,D,H,W] volume. The previous stage's depth
is first bilinearly upsampled to full resolution (msrednet.py:304-306), then
the window is formed and resized to stage resolution, preserving the
reference's order of resampling operations.

``share_cr`` is accepted for CLI parity but rejected: the reference's shared
path passes a list where an int is required and would crash if enabled
(msrednet.py:271).

Documented deviation — stage-1 sweep endpoints: the reference's train/test
orchestrator passes the full ``[B,3] = [min, max, interval]`` ``depth_values``
tensor as ``cur_depth`` (msrednet.py:295-311), and ``get_depth_range_samples``
reads the sweep endpoints as ``cur_depth[:, 0]`` and ``cur_depth[:, -1]``
(module.py:651-653) — so the reference's stage-1 training sweep runs
min → *interval* (a descending sweep to ~0 scene units), not min → max. Its
predict path (``[B,2]`` depth_values) sweeps min → max. This implementation
sweeps min → max in both paths (matching the predict path, the AdaMVS family,
and the obvious intent); a trained-from-scratch model here therefore sees a
different stage-1 hypothesis distribution than a reference training run.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import ConvReLU, ConvTransReLU
from ..nn.costreg import RedCell
from ..nn.fastconv import FastConv
from ..nn.featurenet import RedFeatureNet
from ..ops.regression import (
    online_softmax_finalize,
    online_softmax_init,
    online_softmax_update,
    resize_bilinear,
)
from ..ops.sampling import window_min_and_interval
from ..ops.sweep_fuse import (
    fold_grid,
    merge_sources,
    unfold_tiles,
    var_sweep_volume,
    var_sweep_volume_t,
)
from ..ops.warp import plane_sweep_warp
from .adamvs import _num_src, get_warp_fn, parse_depth_values, prepare_warp_sources


class _RedStreamCell(nn.Module):
    """One depth-hypothesis step: warp, variance aggregation, RED-GRU step,
    online-softmax accumulation."""

    base: int
    warp_impl: str = "gather"
    warp_bands: tuple[int, int] = (32, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, d, ref_feat, src_feats, src_projs, ref_proj, lo, step):
        red_carry, acc = carry
        hyp = lo + d * step  # [B,h,w]
        depth_arg = hyp[:, None]

        warp_fn = get_warp_fn(self.warp_impl, self.warp_bands)
        num_src = _num_src(src_feats)
        num_views = num_src + 1
        s = ref_feat
        sq = ref_feat * ref_feat
        for v in range(num_src):
            warped = warp_fn(src_feats[v], src_projs[v], ref_proj, depth_arg)[:, 0]
            s = s + warped
            sq = sq + warped * warped
        variance = sq / num_views - (s / num_views) ** 2  # [B,h,w,C]

        red_carry, cost = RedCell(self.base, dtype=self.dtype, name="cell")(red_carry, variance)
        acc = online_softmax_update(acc, cost[..., 0], hyp)
        return (red_carry, acc), jnp.float32(0.0)


class _RedIdxStreamCell(nn.Module):
    """Scan cell over precomputed variance slices (the one-call fused-sweep
    path, ops/sweep_fuse.py ``var_sweep_volume``). Same parameter tree as
    ``_RedStreamCell`` (one ``cell`` submodule). ``grid`` non-empty: slices
    arrive kernel-folded [B*T, C, P] and are unfolded here per slice."""

    base: int
    grid: tuple = ()
    tile: tuple[int, int] = (8, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, variance, d, lo, step):
        red_carry, acc = carry
        if self.grid:
            variance = unfold_tiles(variance, self.grid, *self.tile)
        red_carry, cost = RedCell(self.base, dtype=self.dtype, name="cell")(
            red_carry, variance
        )
        acc = online_softmax_update(acc, cost[..., 0], lo + d * step)
        return (red_carry, acc), jnp.float32(0.0)


def red_precomp_depth(cell_params: dict, var_all: jnp.ndarray, base: int,
                      lo: jnp.ndarray, step: jnp.ndarray,
                      dtype=None, chunk: int = 8):
    """The 4-level GN-GRU recurrence (reference RED_Regularization,
    msrednet.py:134-181) restructured for the TPU's serial-scan economics:

    - every INPUT-side conv — the encoder pyramid c1..c3 and the x-half of
      each GRU's gates/candidate convs (conv over concat(x,h) splits by
      linearity into conv_x(x) + conv_h(h)) — is batched over the whole depth
      axis OUTSIDE the scan: large [D*B] MXU convs instead of D per-slice
      dispatches;
    - the scan carries only the 4 GN-GRU states and per step runs just the
      small h-side convs + GroupNorm + elementwise cell math. GroupNorm's
      statistics are GLOBAL over (H, W, C) per slice (module.py:54-106),
      which is why the halo-tiled Pallas skeleton of ops/red_scan.py cannot
      be reused here — row tiles cannot normalize independently;
    - the decoder (upconv chain, depth-independent given the emitted r_k)
      runs batched over D after the scan.

    ``cell_params``: the flax RedCell subtree (same checkpoint as the scan
    path). ``var_all`` [D,B,h,w,C]; ``lo``/``step`` hypothesis maps at stage
    resolution. Returns (depth [B,h,w], confidence [B,h,w]).
    Inference-only by design: parameters arrive as data, so gradients would
    not reach the train state (the scan path remains the training path).

    The depth axis is processed in ``chunk``-sized blocks under an outer
    ``lax.scan`` carrying the GRU states AND the online-softmax accumulator:
    neither the batched intermediates nor a [D,B,h,w] cost volume ever
    materialize (all-D batching OOM'd HBM at bench shapes — 46 GB; the cost
    volume additionally picks a D-minor layout that 16x lane-pads).
    """
    D, B, h, w, C = var_all.shape
    b = base
    dt = dtype
    K = chunk if D % chunk == 0 else D

    # level metadata: (flax cell name, hidden); order = reference conv_gru1..4
    levels = [("GNConvGRUCell_3", b), ("GNConvGRUCell_2", 2 * b),
              ("GNConvGRUCell_1", 4 * b), ("GNConvGRUCell_0", 8 * b)]
    # per-level spatial dims: stride-2 convs emit ceil(h/2) (torch grid)
    dims = [(h, w)]
    for _ in range(3):
        dims.append((-(-dims[-1][0] // 2), -(-dims[-1][1] // 2)))
    hside = []
    for li, (name, ch) in enumerate(levels):
        p = cell_params[name]
        cin = (C, 2 * b, 4 * b, 8 * b)[li]
        hside.append((
            p["FastConv_0"]["kernel"][:, :, cin:],
            p["FastConv_1"]["kernel"][:, :, cin:],
            p["GroupNorm_0"], p["GroupNorm_1"], p["GroupNorm_2"], ch,
            dims[li],
        ))

    def xside(name, ch, inp):
        p = cell_params[name]
        kg, bg = p["FastConv_0"]["kernel"], p["FastConv_0"]["bias"]
        kc, bc = p["FastConv_1"]["kernel"], p["FastConv_1"]["bias"]
        cin = inp.shape[-1]
        g = FastConv(2 * ch, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": {"kernel": kg[:, :, :cin], "bias": bg}}, inp)
        c = FastConv(ch, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": {"kernel": kc[:, :, :cin], "bias": bc}}, inp)
        return g, c  # [K*B, hh, ww, .]

    def gru_step(hk, gxk, cxk, lvl):
        khg, khc, gn_r, gn_u, gn_o, ch, _ = lvl
        gates = gxk + FastConv(2 * ch, (3, 3), use_bias=False, dtype=dt).apply(
            {"params": {"kernel": khg}}, hk)
        gn = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt)
        r = nn.sigmoid(gn.apply({"params": gn_r}, gates[..., :ch]))
        u = nn.sigmoid(gn.apply({"params": gn_u}, gates[..., ch:]))
        o = cxk + FastConv(ch, (3, 3), use_bias=False, dtype=dt).apply(
            {"params": {"kernel": khc}}, r * hk)
        cand = nn.tanh(gn.apply({"params": gn_o}, o))
        return u * hk + (1 - u) * cand

    carry0 = tuple(
        jnp.zeros((B,) + lvl[6] + (lvl[5],), dt or jnp.float32) for lvl in hside
    )

    def chunk_body(carry, var_chunk):  # [K*B, h, w, C]
        # inner K steps UNROLLED: lax.scan stacking of [K,B,...] blocks with
        # two small leading dims forces 16x lane-padded layouts at full res
        hs_in, acc, d0 = carry
        x = -var_chunk
        c1 = ConvReLU(2 * b, 3, 2, dtype=dt).apply(
            {"params": cell_params["ConvReLU_0"]}, x)
        c2 = ConvReLU(4 * b, 3, 2, dtype=dt).apply(
            {"params": cell_params["ConvReLU_1"]}, c1)
        c3 = ConvReLU(8 * b, 3, 2, dtype=dt).apply(
            {"params": cell_params["ConvReLU_2"]}, c2)
        gcx = [
            xside("GNConvGRUCell_3", b, x),
            xside("GNConvGRUCell_2", 2 * b, c1),
            xside("GNConvGRUCell_1", 4 * b, c2),
            xside("GNConvGRUCell_0", 8 * b, c3),
        ]
        rs = [[], [], [], []]
        hs = list(hs_in)
        for k in range(K):
            for li in range(4):
                g, c = gcx[li]
                hs[li] = gru_step(
                    hs[li], g[k * B : (k + 1) * B], c[k * B : (k + 1) * B],
                    hside[li],
                )
                rs[li].append(hs[li])
        r1, r2, r3, r4 = (jnp.concatenate(r, axis=0) for r in rs)  # [K*B,...]
        u3 = ConvTransReLU(4 * b, dtype=dt, use_stock=True).apply(
            {"params": cell_params["ConvTransReLU_0"]}, r4)
        u2 = ConvTransReLU(2 * b, dtype=dt, use_stock=True).apply(
            {"params": cell_params["ConvTransReLU_1"]}, u3 + r3)
        u1 = ConvTransReLU(b, dtype=dt, use_stock=True).apply(
            {"params": cell_params["ConvTransReLU_2"]}, u2 + r2)
        cost = FastConv(1, (3, 3), use_bias=True, dtype=dt).apply(
            {"params": cell_params["FastConv_0"]}, u1 + r1)[..., 0]  # [K*B,h,w]
        for k in range(K):
            acc = online_softmax_update(
                acc, cost[k * B : (k + 1) * B], lo + (d0 + k) * step)
        return (tuple(hs), acc, d0 + K), jnp.float32(0.0)

    carry_full = (carry0, online_softmax_init((B, h, w)), jnp.float32(0.0))
    (_, acc, _), _ = jax.lax.scan(
        chunk_body, carry_full,
        var_all.reshape((D // K, K * B) + var_all.shape[2:]),
    )
    return online_softmax_finalize(acc)


class MSREDNet(nn.Module):
    """Cascade orchestrator (reference CascadeREDNet msrednet.py:246-334)."""

    ndepths: tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: tuple[float, ...] = (4.0, 2.0, 1.0)
    base: int = 8
    cr_base: tuple[int, ...] = (8, 8, 8)
    arch_mode: str = "unet"
    share_cr: bool = False
    warp_impl: str = "gather"
    warp_bands: tuple[int, int] = (32, 256)
    use_remat: bool = True
    dtype: Any = None
    # "scan" | "fused" (bf16 bands) | "fusedf32": see AdaMVS.sweep_impl
    sweep_impl: str = "scan"
    fuse_bands: tuple[int, int] = (12, 128)
    fuse_d_chunk: int = 16
    # "scan": per-slice RedCell inside the depth scan. "precomp": input-side
    # convs batched over D outside the scan + thin GN-GRU scan + batched
    # decoder (red_precomp_depth) — inference-only, requires sweep_impl
    # "fused"/"fusedf32" and ``packed_reg`` (model_pack_reg) in __call__.
    reg_impl: str = "scan"

    def feature_module(self) -> nn.Module:
        return RedFeatureNet(
            self.base, num_stages=len(self.ndepths), arch_mode=self.arch_mode,
            dtype=self.dtype, parent=None,
        )

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,
        proj_matrices: dict[str, jnp.ndarray],
        depth_values: jnp.ndarray,
        train: bool = False,
        num_depth: int | None = None,
        features: dict[str, jnp.ndarray] | None = None,
        packed_reg: tuple | None = None,
    ) -> dict:
        if self.share_cr:
            raise NotImplementedError(
                "share_cr is broken in the reference (msrednet.py:271) and unsupported here"
            )
        dmin, dmax, interval = parse_depth_values(depth_values, num_depth)

        if features is None:
            B, V = imgs.shape[:2]
            H, W = imgs.shape[2:4]
            flat = imgs.reshape((B * V,) + imgs.shape[2:])
            feats = RedFeatureNet(
                self.base, num_stages=len(self.ndepths), arch_mode=self.arch_mode,
                dtype=self.dtype, name="feature",
            )(flat, train)
            feats = {k: v.reshape((B, V) + v.shape[1:]) for k, v in feats.items()}
        else:
            feats = features
            last = feats[f"stage{len(self.ndepths)}"]
            if isinstance(last, tuple):
                B, V = last[0].shape[0], last[1].shape[0] + 1
                H, W = last[0].shape[1:3]  # last stage runs at full (band) res
            else:
                B, V = last.shape[:2]
                H, W = last.shape[2:4]

        cell_cls = nn.remat(_RedStreamCell) if self.use_remat else _RedStreamCell
        scan_cell = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 6,
            out_axes=0,
        )
        idx_cls = nn.remat(_RedIdxStreamCell) if self.use_remat else _RedIdxStreamCell
        scan_idx = nn.scan(
            idx_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, 0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        # fused sweep: inference uses the folded kernel layout; training
        # backpropagates through the gather-recompute VJP (var_sweep_volume_t)
        fused_cfg = self.sweep_impl in ("fused", "fusedf32")
        use_fused = fused_cfg and not train
        use_fused_t = fused_cfg and train
        fuse_mm = jnp.float32 if self.sweep_impl == "fusedf32" else jnp.bfloat16
        use_precomp = (
            use_fused and self.reg_impl == "precomp" and packed_reg is not None
        )
        if (
            self.reg_impl == "precomp"
            and not train
            and not self.is_initializing()
            and not use_precomp
        ):
            raise ValueError(
                "reg_impl='precomp' requires sweep_impl='fused'/'fusedf32' and "
                "packed_reg=model_pack_reg(model, variables) passed to "
                f"__call__ (got sweep_impl={self.sweep_impl!r}, "
                f"packed_reg={'set' if packed_reg is not None else 'None'})"
            )

        outputs: dict[str, Any] = {}
        prev_depth = None
        for si in range(len(self.ndepths)):
            key = f"stage{si + 1}"
            D = self.ndepths[si]
            feat = feats[key]
            projs = proj_matrices[key]
            if isinstance(feat, tuple):
                ref_feat, src_feats = feat
            else:
                ref_feat = feat[:, 0]
                src_feats = jnp.moveaxis(feat[:, 1:], 1, 0)
            ref_proj, src_projs = projs[:, 0], projs[:, 1:]
            src_projs = jnp.moveaxis(src_projs, 1, 0)
            h, w = ref_feat.shape[1:3]
            # pallas2: hoist the merged-lane source transform out of the scan
            any_fused = use_fused or use_fused_t
            src_feats_w = src_feats if any_fused else prepare_warp_sources(
                self.warp_impl, self.warp_bands, src_feats, self.dtype
            )

            step_interval = (self.depth_intervals_ratio[si] * interval)[:, None, None]
            if prev_depth is None:
                lo = jnp.broadcast_to(dmin[:, None, None], (B, h, w))
                step = jnp.broadcast_to(((dmax - dmin) / (D - 1))[:, None, None], (B, h, w))
            else:
                # reference order: prev depth -> full res, window at full res,
                # volume trilinear-resized to stage res (see module docstring)
                prev_full = resize_bilinear(prev_depth, H, W)
                lo_f, step_f = window_min_and_interval(prev_full, D, step_interval)
                lo = resize_bilinear(lo_f, h, w)
                step = resize_bilinear(step_f, h, w)

            # carry dtype must match the cell compute dtype (see adamvs.py)
            red_carry = RedCell(self.cr_base[si]).init_carry(
                B, h, w, self.dtype or jnp.float32
            )
            acc = online_softmax_init((B, h, w))
            d_idx = jnp.arange(D, dtype=jnp.float32)
            depth = conf = None
            if any_fused:
                src_arr = (
                    src_feats
                    if isinstance(src_feats, jnp.ndarray)
                    else jnp.stack(list(src_feats))
                )
            if use_precomp:
                srcs_m = merge_sources(
                    src_arr, row_band=self.fuse_bands[0],
                    col_band=self.fuse_bands[1], mm_dtype=fuse_mm,
                )
                with jax.named_scope(f"{key}_sweep_fusedvol"):
                    var_all = var_sweep_volume(
                        ref_feat, srcs_m, src_projs, ref_proj, lo, step,
                        num_depth=D, d_chunk=self.fuse_d_chunk,
                        out_dtype=self.dtype or jnp.float32,
                    )  # [D,B,h,w,C]
                with jax.named_scope(f"{key}_sweep_precompreg"):
                    depth, conf = red_precomp_depth(
                        packed_reg[si], var_all, self.cr_base[si], lo, step,
                        self.dtype,
                    )
            elif use_fused:
                srcs_m = merge_sources(
                    src_arr, row_band=self.fuse_bands[0],
                    col_band=self.fuse_bands[1], mm_dtype=fuse_mm,
                )
                with jax.named_scope(f"{key}_sweep_fusedvol"):
                    var_all = var_sweep_volume(
                        ref_feat, srcs_m, src_projs, ref_proj, lo, step,
                        num_depth=D, d_chunk=self.fuse_d_chunk,
                        out_dtype=self.dtype or jnp.float32, folded=True,
                    )  # [D,B*T,C,P]
                cell = scan_idx(
                    self.cr_base[si], fold_grid(B, h, w), dtype=self.dtype,
                    name=f"reg{si + 1}",
                )
                with jax.named_scope(f"{key}_sweep_fusedreg"):
                    (red_carry, acc), _ = cell(
                        (red_carry, acc), var_all, d_idx, lo, step
                    )
            elif use_fused_t:
                with jax.named_scope(f"{key}_sweep_fusedvol_t"):
                    var_all = var_sweep_volume_t(
                        ref_feat, src_arr, src_projs, ref_proj, lo, step,
                        D, self.fuse_d_chunk,
                        self.fuse_bands[0], self.fuse_bands[1], fuse_mm,
                        self.dtype or jnp.float32,
                    )  # [D,B,h,w,C]
                cell = scan_idx(
                    self.cr_base[si], (), dtype=self.dtype, name=f"reg{si + 1}"
                )
                with jax.named_scope(f"{key}_sweep_fusedreg_t"):
                    (red_carry, acc), _ = cell(
                        (red_carry, acc), var_all, d_idx, lo, step
                    )
            else:
                cell = scan_cell(
                    self.cr_base[si], self.warp_impl, self.warp_bands,
                    dtype=self.dtype, name=f"reg{si + 1}",
                )
                with jax.named_scope(f"{key}_sweep"):
                    (red_carry, acc), _ = cell(
                        (red_carry, acc), d_idx, ref_feat, src_feats_w, src_projs, ref_proj, lo, step
                    )
            if depth is None:
                depth, conf = online_softmax_finalize(acc)
            outputs[key] = {"depth": depth, "photometric_confidence": conf}
            prev_depth = depth

        outputs.update(outputs[f"stage{len(self.ndepths)}"])
        return outputs
