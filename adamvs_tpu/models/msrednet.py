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

from ..nn.costreg import RedCell
from ..nn.featurenet import RedFeatureNet
from ..ops.regression import (
    online_softmax_finalize,
    online_softmax_init,
    online_softmax_update,
    resize_bilinear,
)
from ..ops.sampling import window_min_and_interval
from ..ops.sweep_fuse import fold_grid, merge_sources, unfold_tiles, var_sweep_volume
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
        # fused sweep is inference-only (no VJP on the Pallas kernels)
        use_fused = self.sweep_impl in ("fused", "fusedf32") and not train
        fuse_mm = jnp.float32 if self.sweep_impl == "fusedf32" else jnp.bfloat16

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
            src_feats_w = prepare_warp_sources(
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
            if use_fused:
                src_arr = (
                    src_feats
                    if isinstance(src_feats, jnp.ndarray)
                    else jnp.stack(list(src_feats))
                )
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
            else:
                cell = scan_cell(
                    self.cr_base[si], self.warp_impl, self.warp_bands,
                    dtype=self.dtype, name=f"reg{si + 1}",
                )
                with jax.named_scope(f"{key}_sweep"):
                    (red_carry, acc), _ = cell(
                        (red_carry, acc), d_idx, ref_feat, src_feats_w, src_projs, ref_proj, lo, step
                    )
            depth, conf = online_softmax_finalize(acc)
            outputs[key] = {"depth": depth, "photometric_confidence": conf}
            prev_depth = depth

        outputs.update(outputs[f"stage{len(self.ndepths)}"])
        return outputs
